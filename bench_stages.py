"""True per-stage device times of the CURRENT bitstream path (forced
completion via scalar pulls).

Times both the encoder-owned analyses and the decoder-executable chain
the encoder drives (codec_runtime.drive_exact), so the bench headline's
encode_device_s decomposes into attributable terms: where the ~6-7% MFU
goes, stage by stage.  Each probe is independent — a failure prints and
moves on (this runs unattended at the end of RD campaigns).
"""

import os
import time
import traceback

import jax

if os.environ.get("BS_CPU"):  # CPU validation at tiny shapes (no chip)
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

H = int(os.environ.get("BS_H", 1088))
W = int(os.environ.get("BS_W", 1920))


def sync(x):
    """Force completion: pull one scalar."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def t(name, fn, *args, n=2):
    try:
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            sync(out)
        print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)
        return out
    except Exception:
        print(f"{name:34s} FAILED", flush=True)
        traceback.print_exc()
        return None


def main():
    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables
    from deepsvc_tpu.ops import warp

    model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    rt = PFrameRuntime(model, variables)
    v = rt.variables

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32)).astype(jnp.bfloat16)
    curr = jnp.clip(ref + jnp.bfloat16(0.02), 0, 1)
    sm = jnp.asarray(
        rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    feat = jnp.zeros((1, H, W, 64), jnp.bfloat16)
    flow = jnp.asarray(
        rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4
    ).astype(jnp.bfloat16)
    img64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32)).astype(
        jnp.bfloat16
    )

    # baseline: sync cost itself
    f_id = jax.jit(lambda x: x + 1)
    t("scalar-sync overhead (x+1)", f_id, jnp.zeros((8, 128)), n=5)

    t("warp 3ch", jax.jit(warp), ref, flow, n=3)
    t("warp 64ch", jax.jit(warp), img64, flow, n=3)

    # ---- encoder-owned analyses (the two big fused dispatches) ----
    a_mv = t("enc_mv analysis (motion+g_a/h_a)", rt._enc_mv, v, ref, curr)

    # ---- MV chain: the decoder executables the encoder drives ----
    mvrt = rt.mv_rt
    z_sym, y = a_mv["z_sym"], a_mv["y"]
    y_shape = (int(y.shape[1]), int(y.shape[2]))
    ms = mvrt.module.max_support_slices
    lat = t("mv decode_hyper (h_s)", mvrt._decode_hyper, mvrt.variables,
            z_sym, y_shape, None)
    means, scales = lat
    mp = t("mv decode_params (slice 0)", mvrt._decode_params, mvrt.variables,
           means, scales, None)
    mu, idx = mp
    from deepsvc_tpu.models.codec_runtime import _quant_head

    sym = _quant_head(y, mu, 0)
    step1 = t("mv decode_step (1 of %d)" % ms, mvrt._decode_step,
              mvrt.variables, means, scales, None, mu, sym, None, 1)

    def _mv_chain():
        return mvrt.drive_exact(
            a_mv, None,
            finish_fn=lambda m, p, mu_, s, c: rt._mv_finish_mc(
                v, m, p, mu_, s, ref, sm, feat
            ),
        )

    mv_enc = t("mv FULL chain (+MC tail)", lambda: _mv_chain())
    mc = mv_enc["fin"]["mc"] if mv_enc else None

    # individual decode-side tails
    if mv_enc:
        t("mc_stage alone", rt._mc, v, ref,
          jnp.zeros((1, H, W, 2), jnp.bfloat16), sm, feat)

    # ---- residual leg ----
    if mc:
        a_res = t("enc_res analysis (res_in+g_a/h_a)", rt._enc_res, v, ref,
                  curr, mc["predict_frame"], mc["predict_fea"])

        def _res_chain():
            return rt.res_rt.drive_exact(
                a_res, None,
                finish_fn=lambda m, p, mu_, s, c: rt._res_finish_recon(
                    v, m, p, mu_, s, ref, mc["predict_fea"], mc["warp_fea"]
                ),
            )

        t("res FULL chain (+recon tail)", lambda: _res_chain())
        t("recon_stage alone", rt._recon, v, ref,
          jnp.zeros((1, H, W, 64), jnp.bfloat16), mc["predict_fea"],
          mc["warp_fea"])
        t("res_input alone", rt._res_in, v, ref, curr, mc["predict_frame"],
          mc["predict_fea"])

    t("motion_analysis alone (SPyNet)", rt._motion, v, ref, curr)


if __name__ == "__main__":
    main()
