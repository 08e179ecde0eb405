"""Encoder/decoder bit-exactness check for the real-bitstream path.

Runs the tiny P-frame codec through compress_pipelined/finish/decode on
the REAL device (TPU by default; --cpu for the CPU backend) and asserts
the decoder's reconstruction equals the encoder-side reconstruction
bitwise, serial bootstrap and pipelined stream both.

This is the probe that caught the round-3 bf16 desync: TPU bf16 convs
are not bitwise-reproducible across different fusion contexts, so the
entropy-parameter networks must run f32 (image_codec.py module
docstring).  CI cannot cover this (tests are pinned to CPU, where bf16
is cross-program deterministic) — run this on hardware after touching
the codec runtime, entropy stack, or conv lowerings:

    timeout 1800 python scripts/check_bitexact_tpu.py          # bf16
    timeout 1800 python scripts/check_bitexact_tpu.py --f32
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--f32", action="store_true")
p.add_argument("--size", type=int, default=128)
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables

dt = jnp.float32 if args.f32 else jnp.bfloat16
H = W = args.size
model = PFrameCodec(mv_latent=16, res_latent=16, dtype=dt)
variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=H, W=W)
rt = PFrameRuntime(model, variables)

rng = np.random.default_rng(0)
frames = [jnp.asarray(rng.random((1, H, W, 3), np.float32)).astype(dt)
          for _ in range(4)]
sm = jnp.zeros((1, H // 4, W // 4, 256), dt)


def err(a, b):
    return float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())


# serial bootstrap: encoder-side recon must equal the decoded recon
h0 = rt.compress_pipelined(frames[0], frames[1], sm, None)
mv_bs, res_bs = rt.finish(h0)
job = rt.start_decompress(frames[0], mv_bs, res_bs, sm, None)
while not job.step():
    pass
dec0 = job.result
e_recon = err(dec0["recon"], h0["recon"])
e_feat = err(dec0["feature"], h0["feature"])
print(f"serial: recon err {e_recon}  feature err {e_feat}")

# pipelined stream (the bench's headline loop)
ref_e, feat_e = dec0["recon"], dec0["feature"]
pending = None
errs = []
for t in range(3):
    curr = frames[2 + t % 2]
    h = rt.compress_pipelined(ref_e, curr, sm, feat_e)
    if pending is not None:
        pj, enc_recon = pending
        while not pj.step():
            pass
        errs.append(err(pj.result["recon"], enc_recon))
    mv_bs, res_bs = rt.finish(h)
    pending = (rt.start_decompress(ref_e, mv_bs, res_bs, sm, feat_e), h["recon"])
    ref_e, feat_e = h["recon"], h["feature"]
pj, enc_recon = pending
while not pj.step():
    pass
errs.append(err(pj.result["recon"], enc_recon))
print(f"pipelined errs: {errs}")

worst = max([e_recon, e_feat] + errs)
assert worst == 0.0, f"encoder/decoder drift: max err {worst}"
print(f"BITEXACT OK (dtype={dt.__name__}, {H}x{W}, "
      f"{'cpu' if args.cpu else 'device'})")
