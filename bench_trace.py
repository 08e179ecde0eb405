"""Profile one 1080p P-frame encode+decode with jax.profiler and report
where the device time goes (VERDICT r5 item 4: the 13-20x gap between
the packed-conv microbench (200-300 TF/s, ops/packed.py) and the ~15
TF/s end-to-end encode needs an op-level attribution, not another
stage-stopwatch pass).

Writes:
  results/trace_r6/...          raw xplane trace (committable evidence)
  results/trace_r6_ops.json     per-op / per-category device-time table
                                parsed from the trace (tensorboard
                                profile plugin), plus the stage table.

Random-init weights: timing-only (identical program structure to the
trained checkpoints; entropy tables unused on the transform path).
"""

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920
TRACE_DIR = "results/trace_r6"


def main():
    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables

    model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    rt = PFrameRuntime(model, variables)

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    curr = jnp.clip(ref + 0.02, 0, 1)
    sm = jnp.asarray(rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32))
    feat = jnp.zeros((1, H, W, 64), jnp.float32)

    # warm every executable (compiles must not pollute the trace)
    mv_bs, res_bs = rt.compress(ref, curr, sm, feat)
    dec = rt.decompress(ref, mv_bs, res_bs, sm, feat)
    np.asarray(dec["recon"].ravel()[0])

    t0 = time.perf_counter()
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        mv_bs, res_bs = rt.compress(ref, curr, sm, feat)
        dec = rt.decompress(ref, mv_bs, res_bs, sm, feat)
        np.asarray(dec["recon"].ravel()[0])
    jax.profiler.stop_trace()
    traced_s = time.perf_counter() - t0
    print(f"traced 2 enc+dec frames in {traced_s:.2f}s", file=sys.stderr)

    out = {"traced_frames": 2, "traced_wall_s": round(traced_s, 3),
           "resolution": f"{H}x{W}", "dtype": "bfloat16",
           "slice_shapes": "reference (cond 8/4)"}

    # ---- parse the xplane trace into a per-op table ----
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                            recursive=True)
        params = {"graph_viewer_options": {}}
        # op_profile gives the device-time-by-category tree
        data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", params)
        prof = json.loads(data)

        def walk(node, depth=0, rows=None):
            if rows is None:
                rows = []
            m = node.get("metrics", {})
            if m and depth >= 1:
                rows.append({
                    "name": node.get("name", "?"),
                    "depth": depth,
                    "time_frac": m.get("time", 0.0),
                    "flop_rate_frac": m.get("flops", 0.0),
                })
            for ch in node.get("children", []):
                walk(ch, depth + 1, rows)
            return rows

        root = prof.get("byCategory", prof)
        rows = walk(root)
        rows.sort(key=lambda r: -r["time_frac"])
        out["op_profile_top"] = rows[:40]
        out["device_idle_frac"] = (
            prof.get("byCategory", {}).get("metrics", {}).get("time", None)
        )
    except Exception as e:  # noqa: BLE001 — trace parse is best-effort
        out["op_profile_error"] = f"{type(e).__name__}: {e}"[:300]

    os.makedirs("results", exist_ok=True)
    with open("results/trace_r6_ops.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in out if k != "op_profile_top"}))


if __name__ == "__main__":
    main()
