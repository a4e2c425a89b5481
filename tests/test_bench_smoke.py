"""Smoke-test bench.py — the driver-run benchmark — end-to-end on CPU.

bench.py is executed unattended by the build driver on real TPU hardware at
round close; a signature/unpack regression there silently costs the round's
benchmark. This drives bench.main() at tiny shapes with the Pallas NMS in
interpret mode (the kernel does not lower on CPU) and pins the output
contract: one JSON line whose headline `value` is the planted-load figure
(VERDICT r3 #5) with the fetch leg reported separately.
"""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_bench_main_contract(capsys, monkeypatch):
    import jax
    import jax.numpy as jnp

    import yolov3_tpu.ops.nms as nmsmod

    def interp_nms(boxes, scores, cls_ids, iou_thres=0.45, max_det=300, agnostic=False,
                   use_pallas=False):
        from yolov3_tpu.ops.nms_pallas import pallas_greedy_nms

        offset = jnp.where(agnostic, 0.0, cls_ids * nmsmod.MAX_WH)
        scores = jnp.where(scores > 0, scores, -1.0)
        return pallas_greedy_nms(boxes + offset[..., None], boxes, scores, cls_ids,
                                 iou_thres, max_det, interpret=True)

    monkeypatch.setattr(nmsmod, "nms_from_candidates", interp_nms)

    import bench

    rate = bench.main("yolov3-tiny", imgsz=128, batch=2, iters=2, with_planted=True,
                      with_h2d=False, with_train=False, with_latency=False)
    line = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)

    assert out["unit"] == "images/sec"
    # headline == planted-load figure, noise kept for cross-round comparison
    assert out["value"] == out["planted_img_s"] == round(rate, 2)
    assert out["value"] > 0 and out["value_noise"] > 0
    assert out["vs_baseline"] == round(out["value"] / bench.A100_BASELINE_IMGS_PER_S, 3)
    # the planted calibration must put real candidates through top-k + NMS
    assert out["planted_cand_mean"] > 10
    assert out["planted_n_mean"] > 0
    # fetch leg is measured separately, never inside the timed region
    assert out["planted_fetch_mb"] >= 0
    assert out["planted_fetch_relay_s"] >= 0
    assert np.isfinite(out["planted_fetch_relay_s"])
