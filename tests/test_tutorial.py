"""tutorial.ipynb contract: the notebook's commands must match the real API.

The reference ships tutorial.ipynb as its primary onboarding document; ours
mirrors its walkthrough (detect -> validate -> train -> visualize -> export/
serve). These tests keep the notebook honest: every `python -m` module it
references must import, every CLI flag it shows must exist in that module's
argparse surface, and every Python-API symbol it uses must resolve.
"""

import importlib.util
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
NB = REPO / "tutorial.ipynb"


def _code_lines():
    nb = json.loads(NB.read_text())
    assert nb["nbformat"] == 4
    assert len(nb["cells"]) >= 15
    for cell in nb["cells"]:
        if cell["cell_type"] == "code":
            for line in "".join(cell["source"]).splitlines():
                yield line


def test_notebook_modules_and_flags_exist():
    cmds = [
        m for line in _code_lines()
        if (m := re.search(r"python -m ([\w.]+)((?:\s+\S+)*)", line))
    ]
    assert len(cmds) >= 6
    for m in cmds:
        mod, rest = m.group(1), m.group(2)
        spec = importlib.util.find_spec(mod)
        assert spec is not None, f"tutorial references missing module {mod}"
        src = Path(spec.origin).read_text()
        for flag in re.findall(r"(--[a-z][a-z0-9-]*)", rest):
            assert f'"{flag}"' in src or f"'{flag}'" in src, (
                f"tutorial shows {mod} {flag} but the parser doesn't define it"
            )


def test_notebook_python_api_resolves():
    src = "\n".join(_code_lines())
    # setup cell
    assert "notebook_init" in src
    from yolov3_tpu.utils.env import notebook_init  # noqa: F401

    # appendix hub cell
    assert "hub.load" in src
    import yolov3_tpu.hub as hub

    for name in ("yolov3", "yolov3_spp", "yolov3_tiny", "custom", "load"):
        assert callable(getattr(hub, name))


def test_notebook_data_assets_exist():
    src = "\n".join(_code_lines())
    for rel in re.findall(r"(yolov3_tpu/data/\S+?\.(?:jpg|yaml))", src):
        assert (REPO / rel).exists(), rel
    # dataset YAMLs referenced by bare name resolve through the data dir
    for name in re.findall(r"--data (\S+\.yaml)", src):
        assert (REPO / "yolov3_tpu" / "data" / name).exists(), name
