#!/usr/bin/env python
"""Profile the LSM training step and print a per-subsystem time table.

TPU-native replacement for the reference's (absent) profiling story
(SURVEY.md §5: d2 only has IterationTimer + GPUtil prints). Captures a
``jax.profiler`` trace of the bench workload, parses the Chrome-format
``*.trace.json.gz`` directly (the xplane tools are broken in this
image; the JSON trace carries everything: "XLA Ops" thread events with
``args.source``, ``args.tf_op``, ``args.hlo_category``,
``args.shape_with_layout``), and aggregates device op time by source
file / op category.

Usage:
  python tools/profile_step.py [--steps 6] [--by source|tf_op|category]
  python tools/profile_step.py --top 40
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# subsystem buckets keyed on substrings of args.source / args.tf_op
SUBSYSTEMS = [
    ("backbone", ("resnet.py", "backbone/")),
    ("res5", ("res5",)),
    ("roi_align", ("roi_align",)),
    ("rpn+nms", ("rpn.py", "nms.py", "rpn/")),
    ("mmss_heads", ("grounding_head", "transformer_head", "mlp_head",
                    "distill", "mmss")),
    ("language", ("bert.py", "language")),
    ("optimizer", ("solver.py",)),
    ("boxes/match", ("boxes.py", "matcher.py", "box_predictor")),
]


def classify(source: str, tf_op: str) -> str:
    hay = f"{source} {tf_op}"
    for name, keys in SUBSYSTEMS:
        if any(k in hay for k in keys):
            return name
    return "other"


def parse_trace(trace_dir: str):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find pids/tids whose thread name mentions XLA Ops (device stream)
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e.get("args", {}).get("name", ""):
                op_tids.add((e.get("pid"), e.get("tid")))
    rows = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        a = e.get("args", {})
        rows.append({
            "name": e.get("name", ""),
            "ts": e.get("ts", 0.0),
            "dur": e.get("dur", 0),  # microseconds
            "source": a.get("source", ""),
            "tf_op": a.get("tf_op", ""),
            "category": a.get("hlo_category", ""),
            "shape": a.get("shape_with_layout", ""),
        })
    # Control-flow wrappers (while/conditional) are emitted as events
    # that CONTAIN their body ops in time, double-counting them (a
    # while row once read 2x its body in the round-3 eval analysis).
    # Convert every duration to EXCLUSIVE (self) time flame-graph
    # style: subtract the time of events nested inside.
    rows.sort(key=lambda r: (r["ts"], -r["dur"]))
    stack = []
    for r in rows:
        r["self"] = r["dur"]
        end = r["ts"] + r["dur"]
        while stack and stack[-1][0] <= r["ts"]:
            stack.pop()
        if stack and end <= stack[-1][0] + 1e-3:
            stack[-1][1]["self"] -= r["dur"]
        stack.append((end, r))
    for r in rows:
        r["dur"] = max(r.pop("self"), 0)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--by", default="subsystem",
                    choices=["subsystem", "source", "tf_op", "category"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default=None,
                    help="parse an existing trace instead of running")
    ap.add_argument("--mode", default="lsm_train",
                    choices=["lsm_train", "stt_eval"])
    args = ap.parse_args()

    trace_dir = args.trace_dir
    nsteps = args.steps
    if trace_dir is None and args.mode == "stt_eval":
        import jax
        from locov_tpu.utils.misc import compile_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          compile_cache_dir())
        from bench import build_stt_eval
        from locov_tpu.parallel import (get_mesh, make_eval_step,
                                        shard_batch)
        cfg, model, data, class_emb = build_stt_eval()
        params = jax.jit(
            lambda d, c: model.init(jax.random.PRNGKey(0), d, c,
                                    method=model.inference)
        )(data, class_emb)
        mesh = get_mesh(jax.devices()[:1])
        step = make_eval_step(model, mesh)
        data = shard_batch(data, mesh)
        for _ in range(3):
            out = step(params, data, class_emb)
        jax.block_until_ready(out)
        trace_dir = tempfile.mkdtemp(prefix="stt_eval_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(nsteps):
                out = step(params, data, class_emb)
            jax.block_until_ready(out)
        print(f"# trace: {trace_dir}", file=sys.stderr)
    if trace_dir is None:
        import jax
        from locov_tpu.utils.misc import compile_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          compile_cache_dir())
        from bench import build_full
        from locov_tpu.engine.solver import (build_optimizer,
                                             default_frozen_fn)
        from locov_tpu.parallel import (get_mesh, make_train_step,
                                        shard_batch)
        cfg, model, data, class_emb = build_full()
        key = jax.random.PRNGKey(0)
        params = jax.jit(
            lambda d, c, k: model.init(k, d, c, k, method=model.losses)
        )(data, class_emb, key)
        optimizer, _ = build_optimizer(cfg, params,
                                       frozen_fn=default_frozen_fn(cfg))
        opt_state = optimizer.init(params)
        mesh = get_mesh(jax.devices()[:1])
        step = make_train_step(model, optimizer, mesh)
        data = shard_batch(data, mesh)
        # compile + warm
        for _ in range(3):
            key, k = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, data,
                                        class_emb, k)
        float(m["total_loss"])
        trace_dir = tempfile.mkdtemp(prefix="lsm_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(nsteps):
                key, k = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, data,
                                            class_emb, k)
            float(m["total_loss"])
        print(f"# trace: {trace_dir}", file=sys.stderr)

    rows = parse_trace(trace_dir)
    total = sum(r["dur"] for r in rows)
    agg = collections.defaultdict(float)
    example = {}
    for r in rows:
        if args.by == "subsystem":
            key = classify(r["source"], r["tf_op"])
        else:
            key = r[args.by] or "(none)"
        agg[key] += r["dur"]
        if r["dur"] > example.get(key, (0, None))[0]:
            example[key] = (r["dur"], f'{r["name"]} {r["shape"][:60]}')
    print(f"{'bucket':<44} {'ms/step':>9} {'%':>6}   heaviest op")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        ex = example.get(k, (0, ""))[1]
        print(f"{k[:44]:<44} {v / 1e3 / nsteps:>9.2f} "
              f"{100 * v / total:>5.1f}%   {ex}")
    print(f"{'TOTAL (device op time)':<44} "
          f"{total / 1e3 / nsteps:>9.2f} 100.0%")


if __name__ == "__main__":
    main()
