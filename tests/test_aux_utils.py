"""Auxiliary-surface tests: Timeout, clean_url, prune, aux loss modulations,
evolve plot, AutoBatch-from-train wiring — each a reference capability that
must be reachable and behave, not just exist (r1 'dead code' lesson)."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_timeout_context():
    """Timeout kills a slow block and suppresses the error (general.py:158-182)."""
    from yolov3_tpu.utils.general import Timeout

    t0 = time.time()
    with Timeout(1, timeout_msg="slow"):
        time.sleep(5)
    assert time.time() - t0 < 3  # alarm fired, error swallowed


def test_clean_url():
    from yolov3_tpu.utils.general import clean_url

    assert clean_url("https://host/w.pt?auth=token123") == "https://host/w.pt"


def test_prune_sparsity():
    """Global magnitude pruning zeroes ~amount of conv kernel weights."""
    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.utils.profiling import prune

    m = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    pruned, sparsity = prune(m.variables["params"], amount=0.3)
    assert 0.25 < sparsity < 0.35
    # model still runs with pruned weights
    v = dict(m.variables)
    v["params"] = pruned
    feats = m.module.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert all(bool(jnp.isfinite(f).all()) for f in feats)


def test_aux_loss_modulations():
    """BCEBlur / QFocal behave per the reference formulas (utils/loss.py:11-94)."""
    from yolov3_tpu.train.loss import bce_blur_with_logits, bce_with_logits, qfocal_modulation

    logits = jnp.array([2.0, -2.0, 0.5])
    targets = jnp.array([1.0, 0.0, 0.0])
    plain = bce_with_logits(logits, targets).mean()
    blur = bce_blur_with_logits(logits, targets)
    assert float(blur) <= float(plain)  # blur only down-weights
    q = qfocal_modulation(logits, targets, bce_with_logits(logits, targets))
    assert q.shape == logits.shape
    # well-classified example (logit 2 -> target 1) gets heavily down-modulated
    assert float(q[0]) < float(bce_with_logits(logits, targets)[0]) * 0.5


def test_evolve_plots_scatter(tmp_path):
    """evolve() emits the evolution scatter plot (reference train.py:778)."""
    from yolov3_tpu.train.evolve import evolve

    base = {"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0005,
            "box": 0.05, "cls": 0.5, "obj": 1.0, "anchor_t": 4.0}

    calls = []

    def fake_train(hyp):
        calls.append(hyp)
        return (0.5, 0.5, 0.4 + 0.01 * len(calls), 0.2, 0, 0, 0)

    best_hyp, best_fit = evolve(fake_train, base, generations=3, save_dir=tmp_path, seed=0)
    assert len(calls) == 3 and best_fit > 0
    assert (tmp_path / "evolve.csv").exists()
    assert (tmp_path / "evolve.png").exists(), "plot_evolve not produced"


def test_profiler_trace(tmp_path):
    """jax.profiler trace context writes an XProf trace (reference Profile/
    torch_utils.profile analog for deep performance inspection)."""
    from yolov3_tpu.utils import profiling

    with profiling.trace(tmp_path):
        jnp.ones(8).sum().block_until_ready()
    assert any(tmp_path.rglob("*.xplane.pb")), "no trace file produced"


def test_autobatch_minus_one_resolves():
    """batch_size=-1 -> AutoBatch picks a concrete batch from HBM analysis
    (reference train.py:230-232); wired into train() the same way."""
    import inspect

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train import loop
    from yolov3_tpu.utils.autobatch import check_train_batch_size

    m = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    b = check_train_batch_size(m, imgsz=64, candidates=(8, 4, 2, 1))
    assert b in (8, 4, 2, 1)
    assert "check_train_batch_size" in inspect.getsource(loop.train)


def test_check_requirements_and_online():
    """check_requirements (reference general.py check_requirements analog):
    satisfied specs pass, unmet version pins and absent packages are reported;
    auto-install degrades to a warning offline (zero-egress)."""
    from yolov3_tpu.utils.checks import check_online, check_requirements

    assert check_requirements(["numpy", "numpy>=1.0"]) == []
    # semver-equal strings must compare equal ('1.10.0' satisfies '<=1.10')
    import numpy as _np

    v = _np.__version__.split("+")[0]
    short = ".".join(v.split(".")[:2])  # e.g. '2.1' for '2.1.0'
    assert check_requirements([f"numpy<={v}", f"numpy=={v}"], install=False) == []
    if v.endswith(".0"):
        assert check_requirements([f"numpy<={short}", f"numpy=={short}"], install=False) == []
    missing = check_requirements(
        ["numpy>=999.0", "definitely_not_a_real_pkg_xyz", "numpy"], install=False
    )
    assert missing == ["numpy>=999.0", "definitely_not_a_real_pkg_xyz"]
    # exclusions skip checking entirely
    assert check_requirements(["definitely_not_a_real_pkg_xyz"],
                              exclude=("definitely_not_a_real_pkg_xyz",)) == []
    # the online probe must answer (False in this zero-egress image) fast
    import time
    t0 = time.time()
    online = check_online(timeout=1.0)
    assert isinstance(online, bool) and time.time() - t0 < 10


def test_missing_pt_routes_through_release_download(monkeypatch, tmp_path):
    """A nonexistent .pt triggers the release auto-download funnel (reference
    downloads.py:82-128 via DetectMultiBackend/attempt_load), pointed at the
    ultralytics/yolov3 release — not yolov5."""
    from yolov3_tpu.models import loading
    from yolov3_tpu.utils import downloads

    assert "ultralytics/yolov3" in downloads.RELEASE_URL

    calls = {}

    def fake_attempt_download(file, repo_url=downloads.RELEASE_URL):
        calls["file"] = str(file)
        calls["url"] = repo_url
        raise ConnectionError("zero-egress sentinel")

    monkeypatch.setattr(downloads, "attempt_download", fake_attempt_download)
    import pytest

    with pytest.raises(ConnectionError, match="zero-egress sentinel"):
        loading.load_weights(str(tmp_path / "yolov3-tiny.pt"))
    assert calls["file"].endswith("yolov3-tiny.pt")
    assert "ultralytics/yolov3" in calls["url"]
