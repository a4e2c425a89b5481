"""CI workflow + Dockerfile contract: infra files must match the real repo.

The reference ships .github/workflows/ci-testing.yml (its only functional
test gate, SURVEY.md §4) and utils/docker/Dockerfile{,-cpu,-arm64}. Ours are
TPU-first analogs (.github/workflows/ci.yml, docker/Dockerfile{,-cpu}).
These tests keep them honest the same way test_tutorial.py keeps the
notebook honest: every `python -m` module they invoke must import, every CLI
flag must exist in that module's argparse surface, every COPY source must
exist, and the python snippets they embed must use real API symbols.
"""

import importlib.util
import re
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
CI = REPO / ".github" / "workflows" / "ci.yml"
DOCKERFILES = [REPO / "docker" / "Dockerfile", REPO / "docker" / "Dockerfile-cpu"]


def _check_python_m_commands(text, origin):
    cmds = [
        m for line in text.splitlines()
        if (m := re.search(r"python -m ([\w.]+)((?:\s+\S+)*)", line))
    ]
    for m in cmds:
        mod, rest = m.group(1), m.group(2)
        if mod in ("pip", "pytest"):
            continue
        spec = importlib.util.find_spec(mod)
        assert spec is not None, f"{origin} references missing module {mod}"
        src = Path(spec.origin).read_text()
        for flag in re.findall(r"(--[a-z][a-z0-9-]*)", rest):
            assert f'"{flag}"' in src or f"'{flag}'" in src, (
                f"{origin} shows {mod} {flag} but the parser doesn't define it"
            )
    return len(cmds)


def test_ci_workflow_parses_and_matches_cli():
    wf = yaml.safe_load(CI.read_text())
    assert set(wf["jobs"]) == {"tests", "smoke"}
    # every job must run on the CPU backend — GitHub runners have no TPU
    assert wf["env"]["JAX_PLATFORMS"] == "cpu"
    run_text = "\n".join(
        step.get("run", "")
        for job in wf["jobs"].values()
        for step in job["steps"]
    )
    assert _check_python_m_commands(run_text, "ci.yml") >= 5
    # the hub snippet's API symbols resolve
    from yolov3_tpu import hub

    assert callable(hub.custom)
    # data.synthetic must accept the flags the smoke passes it
    syn = Path(importlib.util.find_spec("yolov3_tpu.data.synthetic").origin).read_text()
    for flag in ("--out", "--n", "--imgsz"):
        assert f'"{flag}"' in syn


def test_pyproject_packages_nonpython_runtime_files():
    """The wheel must carry the C++ host-ops source (built at import via
    ctypes), the dataset shell scripts the YAML recipes invoke, and the
    sample images — a YAML-only package-data glob shipped a wheel whose
    native module could not build (caught by installing the wheel to an
    isolated target and driving it)."""
    text = (REPO / "pyproject.toml").read_text()
    m = re.search(r"^yolov3_tpu = \[(.*?)\]$", text, re.M | re.S)
    assert m, "package-data stanza missing"
    globs = m.group(1)
    for pat in ("*.yaml", "*.cpp", "*.sh", "*.jpg"):
        assert pat in globs, f"package-data must include {pat}"


def test_dockerfiles_copy_real_paths_and_real_modules():
    for df in DOCKERFILES:
        text = df.read_text()
        for m in re.finditer(r"^COPY\s+(.+?)\s+\S+$", text, re.M):
            for src in m.group(1).split():
                assert (REPO / src).exists(), f"{df.name} COPYs missing {src}"
        _check_python_m_commands(text, df.name)
        # the native pre-build line uses the real API
        if "native" in text:
            from yolov3_tpu import native

            assert callable(native.available)
