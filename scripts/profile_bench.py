"""Capture a jax.profiler trace of one steady-state bench block and
summarize where the time goes (op-level), using the installed
tensorboard_plugin_profile converters. Writes the raw trace under
validation/profile_r3/ and prints a JSON summary of the top ops.
"""
import glob
import json
import os
import sys

import jax

TRACE_DIR = "validation/profile_r3"


def capture():
    from scripts.check_bench_memory import bench_config
    from cleanmarl_tpu.algos.mappo import make_train

    cfg = bench_config()
    init, block, _, meta = make_train(cfg)
    r = init(jax.random.PRNGKey(0))
    r, m = block(r)
    float(m["train/actor_loss"])          # compile + warm
    with jax.profiler.trace(TRACE_DIR):
        r, m = block(r)
        float(m["train/actor_loss"])


def summarize():
    xplanes = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True
    ))
    if not xplanes:
        print(json.dumps({"error": "no xplane.pb captured"}))
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, params={}
            )
            payload = data[0] if isinstance(data, tuple) else data
            out = os.path.join(TRACE_DIR, f"{tool}.json")
            mode = "wb" if isinstance(payload, bytes) else "w"
            with open(out, mode) as f:
                f.write(payload)
            print(f"wrote {out}")
        except Exception as e:
            print(f"{tool}: failed: {e}")


if __name__ == "__main__":
    if "--summarize-only" not in sys.argv:
        capture()
    summarize()
