"""End-to-end video-detector tests (small depth-26 backbones)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.detect import SELSADetector
from deepsvc_tpu.models import CodecRuntime, ImageCodec
from deepsvc_tpu.models.semantic import SemanticFeatureCodec


@pytest.fixture(scope="module")
def det_setup():
    det = SELSADetector(num_classes=5, sem_N=16, neck_channels=64, depth=26,
                        proposals_per_frame=16)
    x = jnp.zeros((1, 64, 64, 3))
    supp = jnp.zeros((2, 1, 16, 16, 256))
    variables = det.init(
        {"params": jax.random.PRNGKey(0)}, x, supp,
        rng=jax.random.PRNGKey(1), method=SELSADetector.extract_p,
    )
    # extract_i path (teacher + neck) shares the neck; init union
    v_i = det.init({"params": jax.random.PRNGKey(0)}, x,
                   method=SELSADetector.extract_i)

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(b)
            for k, val in a.items():
                out[k] = merge(val, b[k]) if k in b else val
            return out
        return a

    merged = {"params": merge(variables["params"], v_i["params"])}
    if "batch_stats" in v_i or "batch_stats" in variables:
        merged["batch_stats"] = merge(
            variables.get("batch_stats", {}), v_i.get("batch_stats", {})
        )
    return det, merged


@pytest.mark.slow
class TestDetectorEndToEnd:
    def test_extract_paths_and_heads(self, det_setup, rng):
        det, variables = det_setup
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        supp = jnp.asarray(rng.standard_normal((2, 1, 16, 16, 256)).astype(np.float32))

        sm0, fmap_i = det.apply(variables, x, method=det.extract_i)
        assert sm0.shape == (1, 16, 16, 256)
        assert fmap_i.shape == (1, 4, 4, 64)

        out = det.apply(variables, x, supp, rng=jax.random.PRNGKey(2),
                        method=det.extract_p)
        assert out["fmap"].shape == (1, 4, 4, 64)
        assert out["s4"].shape == (1, 4, 4, 2048)

        # head init requires proposals path; build them
        hv = det.init(
            {"params": jax.random.PRNGKey(3)}, out["fmap"][0], (64, 64),
            method=det.propose,
        )

    def test_rpn_roi_pipeline(self, det_setup, rng):
        det, variables = det_setup
        # init rpn/troi/bbox_head params by running propose + roi_forward once
        fmap = jnp.asarray(rng.standard_normal((4, 4, 64)).astype(np.float32))
        memo = jnp.asarray(rng.standard_normal((2, 4, 4, 64)).astype(np.float32))
        v = det.init(
            {"params": jax.random.PRNGKey(0)}, fmap, (64, 64), method=det.propose
        )
        boxes, scores, valid = det.apply(v, fmap, (64, 64), method=det.propose)
        assert boxes.shape[1] == 4

        from deepsvc_tpu.detect.roi_align import roi_align

        ref_feats = roi_align(memo[0], boxes[:8], 7, 1 / 16.0)
        v2 = det.init(
            {"params": jax.random.PRNGKey(1)}, fmap, boxes[:8], memo, ref_feats,
            method=det.roi_forward,
        )
        cls, reg = det.apply(v2, fmap, boxes[:8], memo, ref_feats,
                             method=det.roi_forward)
        assert cls.shape == (8, 6) and reg.shape == (8, 24)

    def test_losses_finite(self, det_setup, rng):
        det, _ = det_setup
        fmap = jnp.asarray(rng.standard_normal((4, 4, 64)).astype(np.float32))
        memo = jnp.asarray(rng.standard_normal((2, 4, 4, 64)).astype(np.float32))
        from deepsvc_tpu.detect.roi_align import roi_align

        ref_feats = jnp.asarray(
            rng.standard_normal((8, 7, 7, 64)).astype(np.float32)
        )
        gt = jnp.asarray([[5.0, 5.0, 40.0, 40.0]], jnp.float32)
        gt_labels = jnp.asarray([2], jnp.int32)
        gt_valid = jnp.asarray([True])
        v = det.init(
            {"params": jax.random.PRNGKey(0)}, fmap, memo, ref_feats,
            gt, gt_labels, gt_valid, (64, 64), jax.random.PRNGKey(1),
            method=det.losses,
        )
        losses = det.apply(
            v, fmap, memo, ref_feats, gt, gt_labels, gt_valid, (64, 64),
            jax.random.PRNGKey(1), method=det.losses,
        )
        for k, val in losses.items():
            assert np.isfinite(float(val)), k
