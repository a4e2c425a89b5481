"""Format benchmark matrix — reference benchmarks.py:44-118 counterpart.

Exports the model to each supported format, validates each export, and prints
a table [Format, Size (MB), mAP50-95, inference ms]. `--hard-fail FLOOR`
asserts the native-path mAP stays above the floor (metric regression gate,
reference benchmarks.py:114-117).
"""

from __future__ import annotations

import argparse
import time


from yolov3_tpu import export as export_mod
from yolov3_tpu.utils.general import LOGGER, file_size


def run(weights="yolov3-tiny", data="coco128.yaml", imgsz=640, batch_size=8, hard_fail=None, formats=None,
        pt_only=False, test=False, half=False):
    """pt_only: native checkpoint path only; test: exports only (no val) —
    reference benchmarks.py --pt-only / --test (benchmarks.py:121-199).
    half: bf16 validation (reference benchmarks.py --half)."""
    from yolov3_tpu.cli.val import load_weights
    from yolov3_tpu.eval import validator

    results = []
    model = load_weights(weights)
    fmts = ("checkpoint",) if pt_only else tuple(formats or export_mod.EXPORT_FORMATS)
    for fmt in fmts:
        t0 = time.time()
        try:
            if fmt == "checkpoint":
                if test:
                    results.append((fmt, 0.0, None, None))
                    continue
                # native path: validate the model directly
                r, _, speeds = validator.run(data, model=model, batch_size=batch_size, imgsz=imgsz, half=half)
                mAP = r[3]
                size = 0.0
                ms = speeds[1]
            else:
                out = export_mod.run(weights, include=(fmt,), imgsz=imgsz, batch=batch_size, half=half)[fmt]
                assert out is not None, "export returned None"
                size = file_size(out)
                if test:  # export-only sweep: report sizes, skip validation
                    results.append((fmt, size, None, None))
                    LOGGER.info(f"benchmark {fmt}: exported in {time.time() - t0:.1f}s")
                    continue
                # export -> val round trip through MultiBackend (reference
                # benchmarks.py:44-118 vals every format)
                from yolov3_tpu.models.backend import MultiBackend

                backend = MultiBackend(out, imgsz=imgsz)
                r, _, speeds = validator.run(data, model=backend, batch_size=batch_size, imgsz=imgsz)
                mAP = r[3]
                ms = speeds[1]
            results.append((fmt, size, mAP, ms))
            LOGGER.info(f"benchmark {fmt}: ok in {time.time() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"benchmark {fmt}: failed — {e}")
            results.append((fmt, None, None, None))

    LOGGER.info(f"\n{'Format':<14}{'Size (MB)':>10}{'mAP50-95':>10}{'ms/img':>10}")
    for fmt, size, mAP, ms in results:
        LOGGER.info(
            f"{fmt:<14}{(f'{size:.1f}' if size is not None else '-'):>10}"
            f"{(f'{mAP:.3f}' if mAP is not None else '-'):>10}{(f'{ms:.1f}' if ms is not None else '-'):>10}"
        )

    if hard_fail is not None and not test:
        native = [r for r in results if r[0] == "checkpoint"][0]
        assert native[2] is not None and native[2] > float(hard_fail), (
            f"HARD FAIL: native mAP50-95 {native[2]} <= floor {hard_fail}"
        )
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="yolov3-tiny")
    p.add_argument("--data", default="coco128.yaml")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--hard-fail", type=float, default=None)
    p.add_argument("--formats", nargs="+", default=None)
    p.add_argument("--pt-only", action="store_true", help="native checkpoint path only")
    p.add_argument("--test", action="store_true", help="exports only, no validation")
    p.add_argument("--half", action="store_true", help="bf16 validation/exports")
    p.add_argument("--device", default="", help="JAX platform, e.g. cpu or tpu (default: auto)")
    a = p.parse_args()
    from yolov3_tpu.utils.general import select_device

    select_device(a.device)
    run(a.weights, a.data, a.imgsz, a.batch_size, a.hard_fail, a.formats, a.pt_only, a.test, a.half)


if __name__ == "__main__":
    main()
