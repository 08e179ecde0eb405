"""P-frame codec: structure + texture layers (NHWC, flax).

TPU-native redesign of the reference's DeepSVC video model
(/root/reference/video_model.py:13-191) and its motion-compensation /
inter-layer-prediction head (modules.py:377-438):

  flow -> MV codec -> MV refine -> warp -> inter-layer prediction (fused
  with the semantic feature) -> feature-space residual codec -> residual
  refine -> dual-UNet reconstruction -> (recurrent feature, RGB frame)

The forward is staged into jittable methods so the bitstream runtime can
interleave host entropy coding between device stages without retracing.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pixel_shuffle, warp
from .flow import MESpynet
from .image_codec import ConditionalCodec
from .layers import (
    Conv,
    FeatureExtraction,
    Reconstruction,
    RefineNet,
    ResBlock,
    leaky_relu,
)

Dtype = Any


class InterLayerPrediction(nn.Module):
    """Motion compensation fused with the semantic feature
    (modules.py:377-438).

    Warps the previous recurrent feature (or a ref-frame embedding) by the
    decoded MV, converts the 256ch@H/4 semantic feature to 64ch@H via
    PixelShuffle(4)+conv ("d2s"), embeds both, and emits a 32-ch context
    plus the blended predicted frame.
    """

    hidden: int = 64
    up_out: int = 32
    out_ch: int = 3
    # fuse_scale=2: the semantic-fusion context branch (fea_convert /
    # fea_embd / fea_ext / weight / out_conv) and the warped-feature
    # embedding run at HALF resolution and the 32-ch context + blend
    # weights are bilinearly upsampled before blending with the FULL-RES
    # warped frame.  ~4x cheaper on the branch convs and ~4x fewer
    # gather rows on the 64-ch feature warp; the pixel-detail path
    # (warped frame, feature_extractor, reconstruction) stays full-res.
    # The fast serving profile (r4 perf redesign) — the reference always
    # fuses at full resolution (modules.py:377-438).
    fuse_scale: int = 1
    dtype: Dtype = jnp.float32
    packed: bool = False  # convs via the exact h2 lowering (layers.Conv)

    def setup(self):
        dt = self.dtype
        pk = self.packed
        self.in_conv = nn.Sequential([Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
                                      ResBlock(self.hidden, dtype=dt, packed=pk)])
        self.in_conv1 = nn.Sequential([Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
                                       ResBlock(self.hidden, dtype=dt, packed=pk)])
        self.d2s_conv = Conv(64, 3, 1, dtype=dt, packed=pk)
        self.fea_convert = nn.Sequential([Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
                                          ResBlock(self.hidden, dtype=dt, packed=pk)])
        self.fea_embd = nn.Sequential([
            Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
            ResBlock(self.hidden, dtype=dt, packed=pk),
            ResBlock(self.hidden, start_from_relu=False, dtype=dt, packed=pk),
        ])
        self.fea_ext = nn.Sequential([
            Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
            ResBlock(self.hidden, dtype=dt, packed=pk),
            ResBlock(self.hidden, dtype=dt, packed=pk),
            Conv(self.up_out, 3, 1, dtype=dt, packed=pk),
        ])
        # Identity-start MC: predict = w*warped + (1-w)*out_conv(up_out)
        # (modules.py:435-436).  At the default init w ~= 0.5 and out_conv
        # is random, so the MC stage STARTS ~6 dB below plain warping and
        # short schedules never close the gap (r3: mcpsnr 14.1 < warppsnr
        # 20.3 after 4k steps).  Zero-init out_conv and bias the blend
        # toward warped (sigmoid(3) ~= 0.95) so MC == 0.95*warped at step
        # 0 and training only ever *improves* on warping.
        self.out_conv = Conv(self.out_ch, 3, 1, dtype=dt, packed=pk,
                             kernel_init=nn.initializers.zeros)
        self.weight = nn.Sequential([
            Conv(self.hidden, 3, 1, dtype=dt, packed=pk),
            ResBlock(self.hidden, dtype=dt, packed=pk),
            Conv(3, 3, 1, dtype=dt, packed=pk,
                 bias_init=nn.initializers.constant(3.0)),
            nn.sigmoid,
        ])

    def embed(self, ref_frame, feature):
        """The to-be-warped feature embedding (ref or recurrent branch)."""
        if feature is None:
            return leaky_relu(self.in_conv(ref_frame), 0.01)
        return leaky_relu(self.in_conv1(feature), 0.01)

    def fuse(self, warped, mv, sm_fea, fea_warped):
        """Post-warp fusion with the semantic feature.

        ``fea_warped`` is at full resolution when fuse_scale == 1, at
        half resolution when fuse_scale == 2 (mc_stage warps the
        embedding in the matching space)."""
        from ..ops import bilinear_up2

        s = self.fuse_scale
        curr = self.fea_convert(self.d2s_conv(pixel_shuffle(sm_fea, 4 // s)))
        fea3 = self.fea_embd(jnp.concatenate([fea_warped, curr], axis=-1))
        up_out = self.fea_ext(fea3)
        w = self.weight(up_out)
        ctx = self.out_conv(up_out)
        if s == 2:
            up_out = bilinear_up2(up_out)
            w = bilinear_up2(w)
            ctx = bilinear_up2(ctx)
        out = w * warped + (1.0 - w) * ctx
        return up_out, out

    def __call__(self, ref_frame, warped, mv, sm_fea, feature=None):
        from ..ops import avg_pool_2x2

        if self.fuse_scale == 2:
            # embed on the DOWNSAMPLED source (saves the in_conv cost
            # too), warp on the half-res grid with half-pixel flow
            ref_h = avg_pool_2x2(ref_frame)
            fea_h = None if feature is None else avg_pool_2x2(feature)
            fea = warp(self.embed(ref_h, fea_h), avg_pool_2x2(mv) * 0.5)
        else:
            fea = warp(self.embed(ref_frame, feature), mv)
        return self.fuse(warped, mv, sm_fea, fea)


class PFrameCodec(nn.Module):
    """The DeepSVC P-frame model (video_model.py:13-25)."""

    mv_latent: int = 64
    res_latent: int = 96
    feature_channels: int = 64
    # fast serving profile knobs (1 = reference-shaped; 2 = half-res
    # flow base / MC fusion branch — see MESpynet / InterLayerPrediction)
    me_base_scale: int = 1
    fuse_scale: int = 1
    # channel-AR slice shape of the MV/residual codecs (None = the
    # ConditionalCodec defaults, 4 slices / 1 support; the reference
    # shape is 8/4, image_model.py:114-146 — results/slice_ab.json)
    cond_num_slices: int | None = None
    cond_max_support_slices: int | None = None
    dtype: Dtype = jnp.float32
    packed: bool = True  # exact h2 conv lowering for the transform stacks

    def setup(self):
        dt = self.dtype
        nf = self.feature_channels
        pk = self.packed
        slice_kw = {}
        if self.cond_num_slices is not None:
            slice_kw["num_slices"] = self.cond_num_slices
        if self.cond_max_support_slices is not None:
            slice_kw["max_support_slices"] = self.cond_max_support_slices
        self.optic_flow = MESpynet(base_scale=self.me_base_scale,
                                   dtype=dt, packed=pk)
        self.mv_codec = ConditionalCodec(in_ch=8, N=self.mv_latent, out_ch=2,
                                         dtype=dt, **slice_kw)
        self.res_codec = ConditionalCodec(
            in_ch=nf + 6, N=self.res_latent, out_ch=nf, dtype=dt, **slice_kw
        )
        self.mc = InterLayerPrediction(fuse_scale=self.fuse_scale,
                                       dtype=dt, packed=pk)
        self.refine_mv = RefineNet(hidden=64, out_ch=2, dtype=dt, packed=pk)
        self.refine_res = RefineNet(hidden=64, out_ch=nf, dtype=dt, packed=pk)
        self.feature_extractor = FeatureExtraction(nf, dtype=dt, packed=pk)
        self.enhance = Reconstruction(channels=64, out_ch=3, dtype=dt, packed=pk)

    # ------------------------- jittable stages -------------------------

    def motion_analysis(self, ref, curr):
        """Flow estimation + MV-codec input (video_model.py:31-32)."""
        mv = self.optic_flow(curr, ref)
        return jnp.concatenate([curr, mv, ref], axis=-1)

    def mc_stage(self, ref, recon_mv1, sm_fea, feature=None):
        """MV refine -> warp -> inter-layer MC (video_model.py:34-45).

        fuse_scale=1: the frame warp and the MC feature warp share one
        gather (warp is per-channel, so warping the channel-concat is
        exact; gather cost on TPU is per-row, making one 67ch warp
        cheaper than 3ch + 64ch).  fuse_scale=2: the 64-ch feature warp
        moves to the half-res grid (~4x fewer gather rows) and only the
        3-ch frame warps at full res.
        """
        from ..ops import avg_pool_2x2

        recon_mv = self.refine_mv(recon_mv1, ref)
        if self.fuse_scale == 2:
            warped = warp(ref, recon_mv)
            ref_h = avg_pool_2x2(ref)
            fea_h = None if feature is None else avg_pool_2x2(feature)
            fea_w = warp(self.mc.embed(ref_h, fea_h),
                         avg_pool_2x2(recon_mv) * 0.5)
            warp_fea, predict_frame = self.mc.fuse(warped, recon_mv, sm_fea,
                                                   fea_w)
        else:
            fea = self.mc.embed(ref, feature)
            joint = warp(jnp.concatenate([ref, fea], axis=-1), recon_mv)
            warped = joint[..., :3]
            warp_fea, predict_frame = self.mc.fuse(warped, recon_mv, sm_fea,
                                                   joint[..., 3:])
        predict_fea = self.feature_extractor(predict_frame)
        return {
            "recon_mv": recon_mv,
            "warped": warped,
            "warp_fea": warp_fea,
            "predict_frame": predict_frame,
            "predict_fea": predict_fea,
        }

    def res_input(self, ref, curr, predict_frame, predict_fea):
        """Feature-space residual codec input (video_model.py:48-51)."""
        curr_fea = self.feature_extractor(curr)
        res = curr_fea - predict_fea
        return jnp.concatenate([ref, res, predict_frame], axis=-1)

    def recon_stage(self, ref, recon_res1, predict_fea, warp_fea):
        """Residual refine + texture enhancement (video_model.py:57-63)."""
        recon_res = self.refine_res(recon_res1, ref)
        recon_fea = predict_fea + recon_res
        feature, recon = self.enhance(jnp.concatenate([recon_fea, warp_fea], axis=-1))
        return feature, recon

    # ---------------- bitstream-runtime programs ------------------------
    # Encoder-only analysis programs (fused big dispatches); everything
    # the decoder recomputes is then driven through the decoder's own
    # executables for bitwise encoder/decoder agreement
    # (codec_runtime.start_compress).

    def encode_mv_analysis(self, ref, curr):
        """Motion estimation + MV-codec analysis, one dispatch."""
        return self.mv_codec.encode_analysis(self.motion_analysis(ref, curr))

    def encode_res_analysis(self, ref, curr, predict_frame, predict_fea):
        """Residual-codec analysis (given the MC outputs), one dispatch."""
        return self.res_codec.encode_analysis(
            self.res_input(ref, curr, predict_frame, predict_fea)
        )

    # -- fused one-dispatch encoder (A/B only: entropy params come from a
    # different XLA program than the decoder's, so bit-exactness rests on
    # cross-program float determinism — see codec_runtime docstrings).

    def encode_frame(self, ref, curr, sm_fea, feature=None, with_recon=True):
        """Whole P-frame encode as ONE program: motion -> MV encode ->
        MC -> residual encode (+ optionally the decoder-state synthesis
        and reconstruction, for the pipelined encoder)."""
        mv_in = self.motion_analysis(ref, curr)
        mv_enc = self.mv_codec.encode_tpu(mv_in, with_xhat=True)
        mc = self.mc_stage(ref, mv_enc["x_hat"], sm_fea, feature)
        res_in = self.res_input(ref, curr, mc["predict_frame"], mc["predict_fea"])
        res_enc = self.res_codec.encode_tpu(res_in, with_xhat=False)
        out = {"mv_enc": mv_enc, "res_enc": res_enc, "mc": mc}
        if with_recon:
            res_xhat = self.res_codec.synthesize(res_enc["y_hat"])
            feature_out, recon = self.recon_stage(
                ref, res_xhat, mc["predict_fea"], mc["warp_fea"]
            )
            out["recon"] = jnp.clip(recon, 0.0, 1.0)
            out["feature"] = feature_out
        return out

    def mv_finish_mc(self, latent_means, y_hat_prev, mu_tail, syms_tail,
                     ref, sm_fea, feature=None):
        """MV decode tail + the MC stage, one dispatch (decode path)."""
        fin = self.mv_codec.decode_finish(latent_means, y_hat_prev, mu_tail,
                                          syms_tail)
        fin["mc"] = self.mc_stage(ref, fin["x_hat"], sm_fea, feature)
        return fin

    def res_finish_recon(self, latent_means, y_hat_prev, mu_tail, syms_tail,
                         ref, predict_fea, warp_fea):
        """Residual decode tail + reconstruction, one dispatch."""
        fin = self.res_codec.decode_finish(latent_means, y_hat_prev, mu_tail,
                                           syms_tail)
        feature, recon = self.recon_stage(ref, fin["x_hat"], predict_fea,
                                          warp_fea)
        fin["feature"] = feature
        fin["recon"] = jnp.clip(recon, 0.0, 1.0)
        return fin

    # ----------------------------- forward -----------------------------

    def __call__(self, ref, curr, sm_fea, feature=None, *, rng=None,
                 training=True, mc_only=False):
        """Full training/eval forward (video_model.py:27-94).

        Returns a dict with recon, recurrent feature, warped/predicted
        frames, and per-codec likelihoods (the trainer computes
        distortion + bpp from these; MSE vs MS-SSIM is a loss choice,
        not a model fork as in the reference's forward_msssim).
        With mc_only=True this is the reference's truncated forward1.
        """
        if training:
            rng_mv, rng_res = jax.random.split(rng)
        else:
            rng_mv = rng_res = None

        mv_in = self.motion_analysis(ref, curr)
        mv_out = self.mv_codec(mv_in, rng=rng_mv, training=training)
        mc = self.mc_stage(ref, mv_out["x_hat"], sm_fea, feature)

        result = {
            "warped": mc["warped"],
            "predict_frame": mc["predict_frame"],
            "mv_likelihoods": mv_out["likelihoods"],
        }
        if mc_only:
            return result

        res_in = self.res_input(ref, curr, mc["predict_frame"], mc["predict_fea"])
        res_out = self.res_codec(res_in, rng=rng_res, training=training)
        feature_out, recon = self.recon_stage(
            ref, res_out["x_hat"], mc["predict_fea"], mc["warp_fea"]
        )
        result.update(
            recon=recon,
            feature=feature_out,
            res_likelihoods=res_out["likelihoods"],
        )
        return result

    def aux_loss(self):
        return self.mv_codec.aux_loss() + self.res_codec.aux_loss()

    def mv_aux_loss(self):
        return self.mv_codec.aux_loss()

    def res_aux_loss(self):
        return self.res_codec.aux_loss()


def bpp_from_likelihoods(likelihoods: dict, num_pixels: int) -> jnp.ndarray:
    """sum(-log2 p) / pixels over all latent likelihood tensors."""
    total = 0.0
    for lik in likelihoods.values():
        total += jnp.log(lik).sum() / (-jnp.log(2.0) * num_pixels)
    return total


def init_pframe_variables(module: PFrameCodec, rng, H=64, W=64, batch=1):
    """Initialize ALL params: both MC branches (feature None / present).

    flax init only traces one code path; the first P-frame of a GOP uses
    the ref-frame branch (mc.in_conv) while later frames use the
    recurrent branch (mc.in_conv1).  One full init covers the recurrent
    branch; the missing mc.in_conv subtree is grafted from a cheap
    standalone InterLayerPrediction init (full double-init of the whole
    codec is prohibitively slow on 1-CPU hosts).
    """
    ref = jnp.zeros((batch, H, W, 3))
    curr = jnp.zeros((batch, H, W, 3))
    sm = jnp.zeros((batch, H // 4, W // 4, 256))
    feat = jnp.zeros((batch, H, W, 64))
    # jit the init: eager flax init dispatches every op separately, which
    # costs minutes through a remote-TPU tunnel (~35ms/dispatch)
    v_feat = jax.jit(
        lambda r: module.init({"params": r}, ref, curr, sm, feat,
                              rng=jax.random.PRNGKey(0))
    )(rng)

    mc = InterLayerPrediction(fuse_scale=module.fuse_scale,
                              dtype=module.dtype, packed=module.packed)
    mv = jnp.zeros((batch, H, W, 2))
    v_mc = jax.jit(
        lambda r: mc.init({"params": r}, ref, ref, mv, sm, None)
    )(jax.random.fold_in(rng, 1))
    merged = jax.tree_util.tree_map(lambda x: x, v_feat)  # shallow copy
    merged = dict(merged)
    params = dict(merged["params"])
    mc_params = dict(params["mc"])
    mc_params["in_conv"] = v_mc["params"]["in_conv"]
    params["mc"] = mc_params
    merged["params"] = params
    return merged


