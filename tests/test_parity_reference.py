"""Cross-framework parity: the reference torch model vs yolov3_tpu, same weights.

This is the zero-egress COCO-parity proxy (VERDICT r1 #3): build the
reference `Model` (/root/reference/models/yolo.py:190-295) on CPU, convert
its state_dict through models/convert.py, and assert end-to-end agreement:

  1. decoded predictions (reference yolo.py:104-107 decode) — atol
  2. NMS outputs (reference utils/general.py:630-750 vs ops/nms.py)
  3. mAP on a self-labeled synthetic set — identical metric code over each
     framework's own end-to-end detections, within 0.005

The `ultralytics` pip package the reference depends on is absent in this
image; tests/ultralytics_shim.py supplies the ~30 outsourced symbols with
standard public formulas.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ultralytics_shim as shim  # noqa: E402  (must precede reference imports)

shim.add_reference_to_path()

import jax.numpy as jnp  # noqa: E402

from yolov3_tpu.models.convert import convert_torch_checkpoint  # noqa: E402
from yolov3_tpu.models.detection import DetectionModel  # noqa: E402
from yolov3_tpu.ops.nms import non_max_suppression as our_nms  # noqa: E402


HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
    "label_smoothing": 0.0, "fl_gamma": 0.0, "anchor_t": 4.0,
}


def _synth_batch(n=4, size=320, seed=7):
    """Colored rectangles on gray; returns (imgs_u8 NHWC, targets (m,6) torch)."""
    rng = np.random.default_rng(seed)
    imgs, tgts = [], []
    for b in range(n):
        im = np.full((size, size, 3), 114, np.uint8)
        for _ in range(2):
            cls = int(rng.integers(0, 2))
            w, h = int(rng.integers(80, 160)), int(rng.integers(80, 160))
            x1 = int(rng.integers(0, size - w))
            y1 = int(rng.integers(0, size - h))
            color = (30, 30, 220) if cls == 0 else (220, 30, 30)
            im[y1 : y1 + h, x1 : x1 + w] = color
            tgts.append([b, cls, (x1 + w / 2) / size, (y1 + h / 2) / size, w / size, h / size])
        imgs.append(im)
    return np.stack(imgs), torch.tensor(tgts, dtype=torch.float32)


@pytest.fixture(scope="module")
def ref_tiny():
    """Reference yolov3-tiny briefly overfit on synthetic rectangles (random
    init yields spatially-flat head inputs — no detections to compare), so
    detections are genuinely peaked for the NMS/mAP parity tests."""
    from models.yolo import Model
    from utils.loss import ComputeLoss

    torch.manual_seed(0)
    m = Model("/root/reference/models/yolov3-tiny.yaml", ch=3, nc=80)
    m.hyp = HYP
    for mod in m.modules():  # default BN momentum 0.03 can't track a 60-step overfit
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.momentum = 0.5
    loss_fn = ComputeLoss(m)
    opt = torch.optim.SGD(m.parameters(), lr=0.02, momentum=0.9)
    imgs, targets = _synth_batch()
    x = torch.from_numpy(imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    m.train()
    for _ in range(60):
        opt.zero_grad()
        loss, _ = loss_fn(m(x), targets)
        loss.backward()
        opt.step()
    m.eval()
    return m


@pytest.fixture(scope="module")
def our_tiny(ref_tiny):
    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    variables, report = convert_torch_checkpoint(ref_tiny.state_dict(), model)
    assert not report["missed"], report["missed"][:5]
    return model.replace_variables(variables)


def _ref_forward(ref_model, x_nchw):
    with torch.no_grad():
        y = ref_model(torch.from_numpy(x_nchw))
    return y[0].numpy()


def _our_forward(our_model, x_nhwc):
    pred, _ = our_model.predict(jnp.asarray(x_nhwc))
    return np.asarray(pred)


def make_image(seed=0, size=320):
    """A rectangles-on-gray image from the training distribution."""
    rng = np.random.default_rng(100 + seed)
    im = np.full((size, size, 3), 114, np.uint8)
    for _ in range(2):
        cls = int(rng.integers(0, 2))
        w, h = int(rng.integers(size // 4, size // 2)), int(rng.integers(size // 4, size // 2))
        x1 = int(rng.integers(0, size - w))
        y1 = int(rng.integers(0, size - h))
        im[y1 : y1 + h, x1 : x1 + w] = (30, 30, 220) if cls == 0 else (220, 30, 30)
    return im


def test_param_count_parity(ref_tiny, our_tiny):
    n_ref = sum(p.numel() for p in ref_tiny.parameters())
    assert our_tiny.num_params() == n_ref == 8_852_366


def test_decoded_forward_parity(ref_tiny, our_tiny):
    """Decoded (1, N, 85) inference tensors must agree elementwise."""
    img = make_image(0)
    x = img.astype(np.float32) / 255.0
    ref = _ref_forward(ref_tiny, x.transpose(2, 0, 1)[None])
    ours = _our_forward(our_tiny, x[None])
    assert ref.shape == ours.shape == (1, 1500, 85)  # tiny @ 320: (320/16)^2*3 + (320/32)^2*3
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_nms_parity(ref_tiny, our_tiny):
    """Final detections after each framework's own NMS must match
    (reference general.py:630-750 semantics incl. class offset, multi-label)."""
    from utils.general import non_max_suppression as ref_nms

    img = make_image(1)
    x = img.astype(np.float32) / 255.0
    ref_pred = _ref_forward(ref_tiny, x.transpose(2, 0, 1)[None])
    our_pred = _our_forward(our_tiny, x[None])

    for conf, multi_label in ((0.25, False), (0.4, True)):
        ref_det = ref_nms(torch.from_numpy(ref_pred), conf, 0.45, multi_label=multi_label)[0].numpy()
        our_det = our_nms(our_pred, conf, 0.45, multi_label=multi_label, max_nms=4096)[0]
        assert len(ref_det) > 0, "NMS parity test needs non-empty detections"
        assert len(ref_det) == len(our_det), f"count mismatch at conf={conf}"
        # both are score-descending; compare row-wise
        np.testing.assert_allclose(our_det[:, :4], ref_det[:, :4], atol=0.1)
        np.testing.assert_allclose(our_det[:, 4], ref_det[:, 4], atol=1e-3)
        np.testing.assert_array_equal(our_det[:, 5], ref_det[:, 5])


def test_tta_parity(ref_tiny, our_tiny):
    """TTA (--augment) forward parity: reference _forward_augment
    (yolo.py:239-280: scales [1,.83,.67], lr-flip, descale, tail clip) vs
    predict_augmented. Bilinear resizes differ slightly between frameworks
    (F.interpolate vs jax.image.resize), so parity is asserted on the final
    NMS detections, not elementwise."""
    from utils.general import non_max_suppression as ref_nms

    img = make_image(1)
    x = img.astype(np.float32) / 255.0
    with torch.no_grad():
        ref_pred = ref_tiny(torch.from_numpy(x.transpose(2, 0, 1)[None]), augment=True)[0].numpy()
    our_pred = np.asarray(our_tiny.predict_augmented(jnp.asarray(x[None])))
    assert ref_pred.shape == our_pred.shape  # scales concatenated + tails clipped identically

    # conf 0.1: TTA scale-averaging dilutes this toy model's confidences
    # (dets at ~.29/.23/.19, next at .016 — no threshold-straddling rows)
    ref_det = ref_nms(torch.from_numpy(ref_pred), 0.1, 0.45)[0].numpy()
    our_det = our_nms(our_pred, 0.1, 0.45, max_nms=8192)[0]
    assert len(ref_det) > 0, "TTA parity test needs non-empty detections"
    assert len(ref_det) == len(our_det)
    # residual sub-pixel drift between the two bilinear implementations
    # (both non-antialiased, half-pixel centers)
    np.testing.assert_allclose(our_det[:, :4], ref_det[:, :4], atol=0.5)
    np.testing.assert_allclose(our_det[:, 4], ref_det[:, 4], atol=5e-3)
    np.testing.assert_array_equal(our_det[:, 5], ref_det[:, 5])


def test_map_parity_self_labeled(ref_tiny, our_tiny, tmp_path):
    """End-to-end mAP parity proxy: labels are the REFERENCE model's own
    detections, so its mAP is ~1.0 by construction; the converted model run
    through OUR full val pipeline (letterbox -> forward -> NMS -> scale ->
    process_batch -> ap_per_class) must land within 0.005."""
    import cv2

    from yolov3_tpu.eval.metrics import ap_per_class, process_batch
    from yolov3_tpu.data.augment import letterbox
    from yolov3_tpu.ops.boxes import scale_boxes, xyxy2xywhn
    from utils.general import non_max_suppression as ref_nms

    iouv = np.linspace(0.5, 0.95, 10)
    stats_ref, stats_ours = [], []
    n_labeled = 0
    # the overfit model fires reliably on its training images; mix those
    # (native 320, identity letterbox) with fresh 352px variants (real
    # letterbox + scale_boxes geometry)
    train_imgs, _ = _synth_batch()
    eval_images = [im for im in train_imgs] + [make_image(seed, size=352) for seed in range(4)]
    for img0 in eval_images:
        # identical preprocessing in both frameworks (our letterbox)
        img, ratio, pad = letterbox(img0, (320, 320), auto=False, scaleup=False)
        x = img.astype(np.float32) / 255.0

        ref_pred = _ref_forward(ref_tiny, x.transpose(2, 0, 1)[None])
        ref_det = ref_nms(torch.from_numpy(ref_pred), 0.15, 0.45)[0].numpy()
        if not len(ref_det):
            continue
        # labels := reference detections mapped back to native space
        det_native = ref_det.copy()
        det_native[:, :4] = np.asarray(
            scale_boxes((320, 320), det_native[:, :4], img0.shape[:2], (ratio, pad))
        )
        labels = np.concatenate([det_native[:, 5:6], det_native[:, :4]], 1)  # cls, xyxy native
        n_labeled += len(labels)

        for which, (pred_fn, nms_fn) in {
            "ref": (lambda: ref_pred, lambda p: ref_nms(torch.from_numpy(p), 0.001, 0.6, multi_label=True, max_det=300)[0].numpy()),
            "ours": (lambda: _our_forward(our_tiny, x[None]), lambda p: our_nms(p, 0.001, 0.6, multi_label=True, max_det=300)[0]),
        }.items():
            pred = pred_fn()
            det = nms_fn(pred)
            det = det.copy()
            if len(det):
                det[:, :4] = np.asarray(scale_boxes((320, 320), det[:, :4], img0.shape[:2], (ratio, pad)))
            correct = process_batch(det, labels, iouv) if len(det) else np.zeros((0, 10), bool)
            stat = (correct, det[:, 4] if len(det) else np.zeros(0), det[:, 5] if len(det) else np.zeros(0), labels[:, 0])
            (stats_ref if which == "ref" else stats_ours).append(stat)

    assert n_labeled > 10, "self-labeling produced too few boxes to be meaningful"

    def _map(stats):
        cat = [np.concatenate([s[i] for s in stats], 0) for i in range(4)]
        _, _, _, _, _, ap, _ = ap_per_class(*cat)
        return ap.mean()

    map_ref = _map(stats_ref)
    map_ours = _map(stats_ours)
    # labels come from NMS@0.45/conf0.15 while val runs NMS@0.6/conf0.001
    # multi-label, so self-mAP sits below 1.0 — the parity claim is the GAP
    assert map_ref > 0.5, f"self-labeled reference mAP too low to be meaningful: {map_ref}"
    assert abs(map_ref - map_ours) < 0.005, f"mAP gap: ref {map_ref} vs ours {map_ours}"


def test_loss_parity(ref_tiny, our_tiny):
    """ComputeLoss parity on identical weights/batch (reference utils/loss.py:98-181
    vs train/loss.py): total and per-component losses must agree."""
    from utils.loss import ComputeLoss as RefComputeLoss

    from yolov3_tpu.train.loss import LossConfig, compute_loss

    hyp = {
        "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
        "label_smoothing": 0.0, "fl_gamma": 0.0, "anchor_t": 4.0,
    }
    ref_tiny.hyp = dict(hyp)
    ref_loss_fn = RefComputeLoss(ref_tiny)

    rng = np.random.default_rng(3)
    B, M = 2, 4
    imgs = rng.integers(0, 255, (B, 256, 256, 3), np.uint8)
    x = imgs.astype(np.float32) / 255.0

    boxes = np.array(
        [[[0, 0.5, 0.5, 0.3, 0.3], [5, 0.25, 0.3, 0.1, 0.2]],
         [[10, 0.7, 0.6, 0.4, 0.25], [3, 0.4, 0.8, 0.15, 0.1]]],
        np.float32,
    )

    # reference targets: (n, 6) [img_idx, cls, xywhn]
    tgts = []
    for b in range(B):
        for m in range(2):
            tgts.append([b, boxes[b, m, 0], *boxes[b, m, 1:]])
    ref_targets = torch.tensor(tgts, dtype=torch.float32)

    with torch.no_grad():
        feats_t = ref_tiny(torch.from_numpy(x.transpose(0, 3, 1, 2)))[1]
        ref_total, ref_comps = ref_loss_fn([f for f in feats_t], ref_targets)

    # ours: padded (B, M, 5) + mask
    targets = np.zeros((B, M, 5), np.float32)
    targets[:, :2] = boxes
    mask = np.zeros((B, M), bool)
    mask[:, :2] = True
    cfg = LossConfig.from_model(our_tiny.spec, hyp)
    feats = our_tiny.module.apply(our_tiny.variables, jnp.asarray(x), train=False)
    total, comps = compute_loss(list(feats), jnp.asarray(targets), jnp.asarray(mask), cfg)

    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(comps), ref_comps.numpy()[:3], rtol=5e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Flagship yolov3 @ 640, val-grade settings (VERDICT r2 #1): the exact
# mAP-defining path of the reference — rect letterbox on non-square inputs,
# conf 0.001 / iou 0.6 / multi_label / max_det 300 (reference val.py:196-199,
# 325) — run end-to-end on a 62M-param model with real (fine-tuned) detections.
# ---------------------------------------------------------------------------

_FLAGSHIP_CACHE = Path(__file__).parent.parent / "runs" / "parity_cache" / "yolov3_ft256.pt"


def _flagship_eval_image(seed, shape=(480, 640)):
    """Non-square rectangles-on-gray scene (the fine-tune distribution)."""
    rng = np.random.default_rng(500 + seed)
    h, w = shape
    im = np.full((h, w, 3), 114, np.uint8)
    for _ in range(3):
        cls = int(rng.integers(0, 2))
        bw, bh = int(rng.integers(90, 200)), int(rng.integers(90, 200))
        x1 = int(rng.integers(0, w - bw))
        y1 = int(rng.integers(0, h - bh))
        im[y1 : y1 + bh, x1 : x1 + bw] = (30, 30, 220) if cls == 0 else (220, 30, 30)
    return im


@pytest.fixture(scope="module")
def ref_flagship():
    """Reference 62M-param yolov3 briefly fine-tuned on synthetic rectangles
    (40 steps @ 256px — scale-free: pixel anchors detect the same box sizes at
    640), cached on disk so only the first-ever run pays the ~4 min."""
    from models.yolo import Model

    torch.manual_seed(0)
    torch.set_num_threads(1)
    m = Model("/root/reference/models/yolov3.yaml", ch=3, nc=80)
    if _FLAGSHIP_CACHE.exists():
        m.load_state_dict(torch.load(_FLAGSHIP_CACHE, map_location="cpu"))
        m.eval()
        return m

    from utils.loss import ComputeLoss

    m.hyp = HYP
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.momentum = 0.5
    loss_fn = ComputeLoss(m)
    opt = torch.optim.SGD(m.parameters(), lr=0.02, momentum=0.9)
    imgs, targets = _synth_batch(n=4, size=256)
    x = torch.from_numpy(imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    m.train()
    for _ in range(40):
        opt.zero_grad()
        loss, _ = loss_fn(m(x), targets)
        loss.backward()
        opt.step()
    m.eval()
    _FLAGSHIP_CACHE.parent.mkdir(parents=True, exist_ok=True)
    torch.save(m.state_dict(), _FLAGSHIP_CACHE)
    return m


@pytest.fixture(scope="module")
def our_flagship(ref_flagship):
    model = DetectionModel.from_config("yolov3", imgsz=64)
    variables, report = convert_torch_checkpoint(ref_flagship.state_dict(), model)
    assert not report["missed"], report["missed"][:5]
    return model.replace_variables(variables)


def test_flagship_640_val_grade_parity(ref_flagship, our_flagship):
    """End-to-end at 640 on non-square inputs through rect letterbox:
      1. decoded (1, 20160, 85) forward parity at (512, 640);
      2. NMS-output row parity at conf 0.25 (stable rows);
      3. val-grade NMS (conf 0.001 / iou 0.6 / multi_label / max_det 300,
         reference val.py:196-199) — high-confidence rows exact, and
      4. self-labeled mAP gap < 0.005 over the full val pipeline
         (letterbox -> forward -> NMS -> scale_boxes -> process_batch -> AP).
    """
    from utils.general import non_max_suppression as ref_nms

    from yolov3_tpu.data.augment import letterbox
    from yolov3_tpu.eval.metrics import ap_per_class, process_batch
    from yolov3_tpu.ops.boxes import scale_boxes

    lb_shape = (512, 640)  # a reference rect-val batch shape (stride-64 mult, pad 0.5)
    iouv = np.linspace(0.5, 0.95, 10)
    stats_ref, stats_ours = [], []
    n_labeled = 0
    checked_rows = 0

    for seed, native in [(0, (480, 640)), (1, (480, 640)), (2, (600, 800)), (3, (544, 672))]:
        img0 = _flagship_eval_image(seed, native)
        img, ratio, pad = letterbox(img0, lb_shape, auto=False, scaleup=False)
        assert img.shape[:2] == lb_shape
        x = img.astype(np.float32) / 255.0

        ref_pred = _ref_forward(ref_flagship, x.transpose(2, 0, 1)[None])
        our_pred = _our_forward(our_flagship, x[None])
        assert ref_pred.shape == our_pred.shape == (1, 20160, 85)
        if seed == 0:  # elementwise decoded parity once (the expensive assert)
            np.testing.assert_allclose(our_pred, ref_pred, atol=5e-3, rtol=1e-3)

        # labels := reference detections at conf 0.25, mapped to native space
        ref_det25 = ref_nms(torch.from_numpy(ref_pred), 0.25, 0.45)[0].numpy()
        if not len(ref_det25):
            continue
        our_det25 = our_nms(our_pred, 0.25, 0.45, max_nms=8192)[0]
        assert len(our_det25) == len(ref_det25), f"NMS@0.25 count mismatch seed {seed}"
        np.testing.assert_allclose(our_det25[:, :4], ref_det25[:, :4], atol=0.1)
        np.testing.assert_allclose(our_det25[:, 4], ref_det25[:, 4], atol=2e-3)
        np.testing.assert_array_equal(our_det25[:, 5], ref_det25[:, 5])

        det_native = ref_det25.copy()
        det_native[:, :4] = np.asarray(
            scale_boxes(lb_shape, det_native[:, :4], img0.shape[:2], (ratio, pad))
        )
        labels = np.concatenate([det_native[:, 5:6], det_native[:, :4]], 1)
        n_labeled += len(labels)

        # the exact mAP-defining NMS settings (reference val.py:196-199, 325)
        ref_val = ref_nms(torch.from_numpy(ref_pred), 0.001, 0.6,
                          multi_label=True, max_det=300)[0].numpy()
        our_val = our_nms(our_pred, 0.001, 0.6, multi_label=True, max_det=300,
                          max_nms=30000)[0]
        if seed == 0:
            # the TPU validator's Pallas kernel (gridded over images at these
            # exact val-grade settings, eval/validator.py) must be row-exact
            # with the host NMS on the flagship fixture
            from yolov3_tpu.ops.nms import batched_nms

            out_p, n_p = batched_nms(
                jnp.asarray(our_pred), conf_thres=0.001, iou_thres=0.6,
                multi_label=True, max_det=300, max_nms=30000, use_pallas="interpret",
            )
            pallas_val = np.asarray(out_p[0][: int(n_p[0])])
            assert len(pallas_val) == len(our_val), "Pallas val-grade NMS row count mismatch"
            np.testing.assert_allclose(pallas_val, np.asarray(our_val), rtol=1e-5, atol=1e-4)

        # cross-framework float drift (~1e-3 in conf) legitimately flips rows
        # that straddle conf 0.001; rows above 0.01 must agree exactly
        r_hi, o_hi = ref_val[ref_val[:, 4] > 0.01], our_val[our_val[:, 4] > 0.01]
        assert len(r_hi) == len(o_hi), f"val-grade NMS high-conf count mismatch seed {seed}"
        np.testing.assert_allclose(o_hi[:, :4], r_hi[:, :4], atol=0.15)
        np.testing.assert_allclose(o_hi[:, 4], r_hi[:, 4], atol=2e-3)
        np.testing.assert_array_equal(o_hi[:, 5], r_hi[:, 5])
        checked_rows += len(r_hi)

        for which, det in (("ref", ref_val), ("ours", np.asarray(our_val))):
            det = det.copy()
            if len(det):
                det[:, :4] = np.asarray(
                    scale_boxes(lb_shape, det[:, :4], img0.shape[:2], (ratio, pad))
                )
            correct = process_batch(det, labels, iouv) if len(det) else np.zeros((0, 10), bool)
            stat = (correct, det[:, 4] if len(det) else np.zeros(0),
                    det[:, 5] if len(det) else np.zeros(0), labels[:, 0])
            (stats_ref if which == "ref" else stats_ours).append(stat)

    assert n_labeled >= 4, "fine-tuned flagship produced too few detections to be meaningful"
    assert checked_rows >= 4

    def _map(stats):
        cat = [np.concatenate([s[i] for s in stats], 0) for i in range(4)]
        _, _, _, _, _, ap, _ = ap_per_class(*cat)
        return ap.mean()

    map_ref, map_ours = _map(stats_ref), _map(stats_ours)
    assert map_ref > 0.5, f"self-labeled flagship mAP too low to be meaningful: {map_ref}"
    assert abs(map_ref - map_ours) < 0.005, f"mAP gap: ref {map_ref} vs ours {map_ours}"


@pytest.mark.parametrize("name,n_params", [("yolov3", 61_949_149), ("yolov3-spp", 62_998_749)])
def test_flagship_forward_parity(name, n_params):
    """Full-size darknet-53 models: param-count + decoded-forward parity
    (reference models/yolov3.yaml, yolov3-spp.yaml; SURVEY.md §2.1 counts)."""
    from models.yolo import Model

    torch.manual_seed(0)
    ref = Model(f"/root/reference/models/{name}.yaml", ch=3, nc=80)
    ref.eval()
    assert sum(p.numel() for p in ref.parameters()) == n_params

    ours = DetectionModel.from_config(name, imgsz=64)
    assert ours.num_params() == n_params
    variables, report = convert_torch_checkpoint(ref.state_dict(), ours)
    assert not report["missed"], report["missed"][:5]
    ours = ours.replace_variables(variables)

    img = make_image(0, size=256)
    x = img.astype(np.float32) / 255.0
    ref_out = _ref_forward(ref, x.transpose(2, 0, 1)[None])
    our_out = _our_forward(ours, x[None])
    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(our_out, ref_out, atol=5e-3, rtol=1e-3)


def test_multibackend_loads_reference_pt(ref_tiny, our_tiny, tmp_path):
    """The torch_pt MultiBackend route converts a reference .pt on load
    (reference DetectMultiBackend treats .pt as first-class, common.py:447) —
    decoded outputs must match the in-framework converted model."""
    from yolov3_tpu.models.backend import MultiBackend

    pt = tmp_path / "yolov3-tiny.pt"
    torch.save(ref_tiny.state_dict(), pt)
    mb = MultiBackend(str(pt))
    assert mb.format == "torch_pt" and int(mb.stride) == 32
    imgs, _ = _synth_batch()
    pred = np.asarray(mb(imgs[:2]))  # normalizes uint8 internally; fused model
    want, _ = our_tiny.predict(jnp.asarray(imgs[:2], jnp.float32) / 255.0)
    want = np.asarray(want)
    assert pred.shape == want.shape
    np.testing.assert_allclose(pred, want, rtol=5e-3, atol=5e-3)
