"""Aggregate a framework_op_stats dump (/tmp/op_stats.json, written by
capture_trace.py) into named model stages.

Usage: python scripts/analyze_op_stats.py [path] [--iters 5] [--top 15]
       [--raw 40]

Stages are classified from the XLA op's name-stack path; anything
unmatched lands in 'unclassified' and is itemized so no time hides in an
unnamed bucket (VERDICT r3: small's 9.7 ms "misc" row).
"""
from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict

# (stage, regex over the operation path) — first match wins, order matters
RULES = [
    ("encoder attn", r"encoder/blocks_\d+/attn"),
    ("encoder mlp", r"encoder/blocks_\d+/mlp"),
    ("encoder other", r"encoder/blocks_\d+|/encoder/(norm|ln)"),
    ("patch embed+posemb", r"patch_embed|pos_embed|abs_pos"),
    ("projector", r"projector"),
    ("decoder cross-attn", r"cross_attn|deform|sampling"),
    ("decoder self-attn", r"self_attn"),
    ("decoder other", r"decoder|transformer|enc_out|ref_point|query"),
    ("matcher", r"matcher|hungarian|assign"),
    ("criterion/loss", r"criterion|loss|giou|focal|bce"),
    ("optimizer/ema", r"adam|optimizer|ema|global_norm|clip"),
    ("postprocess top-k", r"top_k|topk|post_process|sort"),
    ("input cast/copy", r"convert|copy(-start|-done)?\.|copy\b"),
]


def load_rows(path):
    data = json.load(open(path))
    table = data[0] if isinstance(data, list) else data
    cols = [c["id"] for c in table["cols"]]
    for row in table["rows"]:
        rec = {cid: cell.get("v") for cid, cell in zip(cols, row["c"])}
        if rec.get("host_or_device") == "Device":
            yield rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="/tmp/op_stats.json")
    ap.add_argument("--iters", type=int, default=5,
                    help="profiled iterations (capture_trace runs 5)")
    ap.add_argument("--top", type=int, default=12,
                    help="ops itemized inside each stage")
    ap.add_argument("--raw", type=int, default=0,
                    help="also dump the top-N raw rows")
    args = ap.parse_args()

    stages = defaultdict(float)
    items = defaultdict(list)
    total = 0.0
    raws = []
    for rec in load_rows(args.path):
        us = (rec.get("total_self_time") or 0.0) / args.iters
        if us <= 0:
            continue
        total += us
        op = rec.get("operation") or ""
        typ = rec.get("type") or ""
        key = "unclassified"
        for stage, pat in RULES:
            if re.search(pat, op, re.I):
                key = stage
                break
        else:
            # fall back to classifying pure data-movement by op TYPE
            if re.fullmatch(r"(convert|copy|transpose|reshape|bitcast"
                            r"|all-reduce|dynamic-update-slice)", typ):
                key = f"data movement ({typ})"
        stages[key] += us
        items[key].append((us, typ, op))
        raws.append((us, typ, op))

    print(f"total device time: {total/1000:.2f} ms/iter")
    for stage, us in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"\n{stage:<28} {us/1000:8.3f} ms  {100*us/total:5.1f}%")
        for u, typ, op in sorted(items[stage], reverse=True)[:args.top]:
            print(f"    {u/1000:8.3f} ms  [{typ}] {op[-100:]}")

    if args.raw:
        print("\n== raw top ops ==")
        for u, typ, op in sorted(raws, reverse=True)[:args.raw]:
            print(f"  {u/1000:8.3f} ms  [{typ}] {op[-110:]}")


if __name__ == "__main__":
    main()
