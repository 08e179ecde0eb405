"""Detection stack tests: box ops vs torchvision, NMS, RoIAlign, heads."""

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


class TestBoxOps:
    def test_iou_vs_torchvision(self, rng):
        from torchvision.ops import box_iou
        import torch

        a = rng.random((20, 4)).astype(np.float32) * 100
        b = rng.random((15, 4)).astype(np.float32) * 100
        a[:, 2:] += a[:, :2]
        b[:, 2:] += b[:, :2]
        ref = box_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
        got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_delta_roundtrip(self, rng):
        anchors = rng.random((30, 4)).astype(np.float32) * 50
        anchors[:, 2:] += anchors[:, :2] + 5
        gt = rng.random((30, 4)).astype(np.float32) * 50
        gt[:, 2:] += gt[:, :2] + 5
        d = encode_deltas(jnp.asarray(anchors), jnp.asarray(gt))
        back = decode_deltas(jnp.asarray(anchors), d)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


class TestNMS:
    def test_vs_torchvision(self, rng):
        from torchvision.ops import nms as t_nms
        import torch

        boxes = rng.random((100, 4)).astype(np.float32) * 100
        boxes[:, 2:] += boxes[:, :2] + 2
        scores = rng.random(100).astype(np.float32)
        ref = t_nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.5).numpy()
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 100, 0.0)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, ref)


class TestRoIAlign:
    def test_vs_torchvision(self, rng):
        from torchvision.ops import roi_align as t_roi
        import torch

        fmap = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
        boxes = np.array(
            [[8.0, 16.0, 100.0, 120.0], [0.0, 0.0, 64.0, 64.0]], np.float32
        )
        ref = t_roi(
            torch.from_numpy(fmap),
            [torch.from_numpy(boxes)],
            output_size=7,
            spatial_scale=1 / 16.0,
            sampling_ratio=2,
            aligned=True,
        ).numpy()
        got = roi_align(
            jnp.asarray(fmap[0].transpose(1, 2, 0)), jnp.asarray(boxes), 7, 1 / 16.0, 2
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4
        )


class TestRPN:
    def test_proposals_shapes(self, rng):
        m = RPNHead()
        fmap = jnp.asarray(rng.standard_normal((1, 8, 8, 512)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), fmap)
        cls, reg = m.apply(v, fmap)
        assert cls.shape == (1, 8, 8, 12) and reg.shape == (1, 8, 8, 48)
        boxes, scores, valid = rpn_proposals(cls[0], reg[0], (128, 128),
                                             post_nms_top=50)
        assert boxes.shape == (50, 4) and bool(valid.any())

    def test_rpn_loss_finite_and_learns_signal(self, rng):
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
