"""Detection stack tests: box ops / NMS / RoIAlign vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.detect import (
    RPNHead,
    SelsaBBoxHead,
    TemporalRoIAlign,
    decode_detections,
    decode_deltas,
    encode_deltas,
    grid_anchors,
    iou_matrix,
    nms,
    roi_align,
    rpn_loss,
    rpn_proposals,
)


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def np_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    ious = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= ious[i] > thresh
        suppressed[i] = True
    return np.asarray(keep)


def np_roi_align(fmap, boxes, out=7, scale=1 / 16.0, ratio=2):
    """Slow numpy RoIAlign (aligned=True), loop form."""
    H, W, C = fmap.shape

    def sample(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        wy, wx = y - y0, x - x0
        v = np.zeros(C, np.float64)
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    v += wy_ * wx_ * fmap[yy, xx]
        return v

    out_arr = np.zeros((len(boxes), out, out, C), np.float64)
    for r, b in enumerate(boxes):
        x1, y1, x2, y2 = b * scale - 0.5
        bw = max(x2 - x1, 1e-4) / out
        bh = max(y2 - y1, 1e-4) / out
        for oy in range(out):
            for ox in range(out):
                acc = np.zeros(C, np.float64)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + (oy + (iy + 0.5) / ratio) * bh
                        x = x1 + (ox + (ix + 0.5) / ratio) * bw
                        acc += sample(y, x)
                out_arr[r, oy, ox] = acc / (ratio * ratio)
    return out_arr.astype(np.float32)


class TestBoxOps:
    def test_iou_vs_numpy(self, rng):
        a = rng.random((20, 4)).astype(np.float32) * 100
        b = rng.random((15, 4)).astype(np.float32) * 100
        a[:, 2:] += a[:, :2]
        b[:, 2:] += b[:, :2]
        got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_iou(a, b), atol=1e-5)

    def test_delta_roundtrip(self, rng):
        anchors = rng.random((30, 4)).astype(np.float32) * 50
        anchors[:, 2:] += anchors[:, :2] + 5
        gt = rng.random((30, 4)).astype(np.float32) * 50
        gt[:, 2:] += gt[:, :2] + 5
        d = encode_deltas(jnp.asarray(anchors), jnp.asarray(gt))
        back = decode_deltas(jnp.asarray(anchors), d)
        # TPU f32 exp/log roundtrip: ~1e-2 px on 50 px boxes
        np.testing.assert_allclose(np.asarray(back), gt, atol=2e-2)


class TestNMS:
    def test_vs_numpy_reference(self, rng):
        boxes = rng.random((100, 4)).astype(np.float32) * 100
        boxes[:, 2:] += boxes[:, :2] + 2
        scores = rng.random(100).astype(np.float32)
        ref = np_nms(boxes, scores, 0.5)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 100, 0.0)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, ref)

    def test_max_out_truncation(self, rng):
        boxes = rng.random((50, 4)).astype(np.float32) * 100
        boxes[:, 2:] += boxes[:, :2] + 2
        scores = rng.random(50).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 5, 0.0)
        assert int(np.asarray(valid).sum()) == 5


class TestRoIAlign:
    def test_vs_numpy_reference(self, rng):
        fmap = rng.standard_normal((16, 16, 8)).astype(np.float32)
        boxes = np.array(
            [[8.0, 16.0, 100.0, 120.0], [0.0, 0.0, 64.0, 64.0],
             [30.0, 40.0, 200.0, 230.0]], np.float32
        )
        ref = np_roi_align(fmap, boxes)
        got = roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 7, 1 / 16.0, 2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TestRPN:
    def test_proposals_shapes(self, rng):
        m = RPNHead()
        fmap = jnp.asarray(rng.standard_normal((1, 8, 8, 512)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), fmap)
        cls, reg = m.apply(v, fmap)
        assert cls.shape == (1, 8, 8, 12) and reg.shape == (1, 8, 8, 48)
        boxes, scores, valid = rpn_proposals(cls[0], reg[0], (128, 128),
                                             post_nms_top=50)
        assert boxes.shape == (50, 4) and bool(np.asarray(valid).any())

    def test_rpn_loss_finite(self, rng):
        m = RPNHead()
        fmap = jnp.asarray(rng.standard_normal((1, 8, 8, 512)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), fmap)
        cls, reg = m.apply(v, fmap)
        gt = jnp.asarray([[10.0, 10.0, 80.0, 90.0], [0, 0, 0, 0]], jnp.float32)
        gt_valid = jnp.asarray([True, False])
        c, r = rpn_loss(cls[0], reg[0], gt, gt_valid, (128, 128))
        assert np.isfinite(float(c)) and np.isfinite(float(r))


class TestSelsaHead:
    def test_bbox_head_shapes(self, rng):
        m = SelsaBBoxHead(num_classes=30, in_channels=64)
        roi = jnp.asarray(rng.standard_normal((12, 7, 7, 64)).astype(np.float32))
        ref = jnp.asarray(rng.standard_normal((24, 7, 7, 64)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), roi, ref)
        cls, reg = m.apply(v, roi, ref)
        assert cls.shape == (12, 31) and reg.shape == (12, 124)

    def test_temporal_roi_align_shapes(self, rng):
        m = TemporalRoIAlign(top_k=2, channels=32)
        roi = jnp.asarray(rng.standard_normal((5, 7, 7, 32)).astype(np.float32))
        refs = jnp.asarray(rng.standard_normal((3, 8, 8, 32)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), roi, refs)
        out = m.apply(v, roi, refs)
        assert out.shape == roi.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_decode_detections(self, rng):
        props = jnp.asarray(rng.random((20, 4)).astype(np.float32) * 60)
        props = props.at[:, 2:].add(props[:, :2] + 4)
        cls = jnp.asarray(rng.standard_normal((20, 31)).astype(np.float32))
        reg = jnp.zeros((20, 124), jnp.float32)
        boxes, scores, labels, valid = decode_detections(props, cls, reg, (128, 128))
        assert boxes.shape[0] == scores.shape[0] == labels.shape[0]
        assert np.isfinite(np.asarray(boxes)).all()
