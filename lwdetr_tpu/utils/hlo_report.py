"""Per-op FLOP breakdown from compiled (optimized) HLO.

TPU-native counterpart of the reference's per-op-class GFLOP report
(/root/reference/util/benchmark.py:471-557: a torch.jit trace walk with ~35
hand-written aten handlers producing ``detailed_flops`` — GFLOPs keyed by op
kind).  Here the compiled executable IS the ground truth: XLA has already
fused/folded everything that will run, so we parse the optimized HLO text
and compute FLOPs per instruction from shapes:

* ``dot``          — 2 * prod(output shape) * prod(lhs contracting dims)
* ``convolution``  — 2 * prod(output shape) * prod(kernel spatial) * kernel_i

Convolution FLOPs are window-exact: the TPU backend expresses many matmuls
and every gradient conv as padded/dilated correlations (e.g. an einsum
transpose becomes ``window={size=104 pad=103_103 rhs_reversal=1}`` where
each output position overlaps exactly ONE valid input tap), so the naive
``prod(kernel spatial)`` formula overcounts by up to the window size; we
count valid (output, tap) pairs per spatial dim from the window attributes
instead, which matches HloCostAnalysis.

Everything else (fused elementwise, reduces, gathers, transposes) is
FLOP-light on the MXU ledger; we report instruction counts and output bytes
for those classes instead.  Totals are cross-checked against
``compiled.cost_analysis()['flops']`` and the coverage ratio is part of the
report: while-loop bodies (lax.scan) are counted once per *call site*, like
XLA's own HloCostAnalysis, so the two columns agree on structure.

The metadata ``op_name`` ("jit(fwd)/backbone/encoder/blocks_3/...") also
lets us attribute dot/conv FLOPs to model stages — a per-stage table the
reference cannot produce from an aten trace.
"""
from __future__ import annotations

import re
from collections import defaultdict
from typing import Callable, Dict, Optional

_SHAPE_RE = re.compile(r"(?:[a-z]+\d*|pred|token)\[([\d,]*)\]")
# TPU-backend as_text() carries layout annotations after every shape —
# f32[128,64]{0,1:T(8,128)S(1)} — whose ':'/'(' break _DEF_RE; strip any
# brace group that immediately follows a ']' (attribute braces like
# lhs_contracting_dims={1} follow '=' and survive)
_LAYOUT_RE = re.compile(r"(?<=\])\{[^{}]*\}")
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*"         # instruction name
    r"(\(?[a-z][\w\[\],\s{}\/\*]*?\)?)\s*"            # result type(s)
    r"([a-z][\w\-]*)\(")                               # opcode
_OPND_RE = re.compile(r"%([\w\.\-]+)")
_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")
_DIMLABELS_RE = re.compile(r"dim_labels=(\w+)_(\w+)->(\w+)")
_METADATA_RE = re.compile(r'op_name="([^"]*)"')
_WINDOW_RE = re.compile(r"window=\{([^}]*)\}")


def _parse_window(attrs: str, ndims: int) -> dict:
    """Parse an HLO window attribute string into per-dim lists."""
    out = {"size": [1] * ndims, "stride": [1] * ndims,
           "pad_lo": [0] * ndims, "lhs_dilate": [1] * ndims,
           "rhs_dilate": [1] * ndims}
    for key, field in (("size", "size"), ("stride", "stride"),
                       ("lhs_dilate", "lhs_dilate"),
                       ("rhs_dilate", "rhs_dilate")):
        m = re.search(rf"{field}=([\dx]+)", attrs)
        if m:
            vals = [int(v) for v in m.group(1).split("x")]
            out[key] = vals + [1] * (ndims - len(vals))
    m = re.search(r"pad=([\d_x\-]+)", attrs)
    if m:
        lo = [int(p.split("_")[0]) for p in m.group(1).split("x")]
        out["pad_lo"] = lo + [0] * (ndims - len(lo))
    return out


def _conv_taps(O: int, S: int, I: int, stride: int, pad_lo: int,
               lhs_dilate: int, rhs_dilate: int) -> int:
    """Valid (output position, kernel tap) pairs along one spatial dim —
    the per-dim factor of HloCostAnalysis' convolution FLOP count."""
    I_dil = (I - 1) * lhs_dilate + 1 if I > 0 else 0
    total = 0
    for p in range(O):
        base = p * stride - pad_lo
        for s in range(S):
            x = base + s * rhs_dilate
            if 0 <= x < I_dil and x % lhs_dilate == 0:
                total += 1
    return total


def _dims(type_str: str):
    """All result-shape dim lists in a (possibly tuple) HLO type string."""
    return [[int(d) for d in m.split(",") if d] if m else []
            for m in _SHAPE_RE.findall(type_str)]


def _prod(dims) -> int:
    out = 1
    for d in dims:
        out *= d
    return out


def parse_hlo_flops(hlo_text: str) -> Dict[str, object]:
    """Walk optimized HLO text; return per-opcode and per-stage FLOPs.

    Returns dict with:
      flops_by_op:    {"dot": float, "convolution": float} (raw FLOPs)
      flops_by_stage: {stage: float} from op_name metadata (top 2 path
                      components past the jit(...) prefix)
      counts_by_op:   {opcode: int} instruction counts (all opcodes)
      bytes_by_op:    {opcode: int} summed output bytes (f32-equivalent 4B
                      approximation is avoided: dtype width parsed per line)
    """
    shapes: Dict[str, list] = {}
    lines = [_LAYOUT_RE.sub("", ln) for ln in hlo_text.splitlines()]
    # pass 1: name -> result dims (first shape of tuple results)
    for ln in lines:
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name, type_str, _ = m.groups()
        dims = _dims(type_str)
        shapes[name] = dims[0] if dims else []

    flops_by_op: Dict[str, float] = defaultdict(float)
    flops_by_stage: Dict[str, float] = defaultdict(float)
    counts_by_op: Dict[str, int] = defaultdict(int)
    bytes_by_op: Dict[str, int] = defaultdict(int)

    def _stage_of(ln: str) -> str:
        mm = _METADATA_RE.search(ln)
        if not mm:
            return "<no-metadata>"
        path = mm.group(1)
        parts = [p for p in path.split("/") if p and not p.startswith("jit(")]
        return "/".join(parts[:2]) if parts else path

    for ln in lines:
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        counts_by_op[opcode] += 1
        out_dims = shapes.get(name, [])
        dt = re.match(r"\(?([a-z]+)(\d*)\[", type_str)
        width = (int(dt.group(2)) // 8) if (dt and dt.group(2)) else 1
        bytes_by_op[opcode] += _prod(out_dims) * max(width, 1)

        if opcode == "dot":
            paren = ln[ln.index("dot(") + 4:]
            opnds = _OPND_RE.findall(paren)
            cm = _CONTRACT_RE.search(ln)
            if not opnds or cm is None:
                continue
            lhs = shapes.get(opnds[0], [])
            cdims = [int(d) for d in cm.group(1).split(",") if d]
            k = _prod([lhs[d] for d in cdims if d < len(lhs)])
            f = 2.0 * _prod(out_dims) * k
            flops_by_op["dot"] += f
            flops_by_stage[_stage_of(ln)] += f
        elif opcode == "convolution":
            paren = ln[ln.index("convolution(") + 12:]
            opnds = _OPND_RE.findall(paren)
            dl = _DIMLABELS_RE.search(ln)
            if len(opnds) < 2 or dl is None:
                continue
            lshape = shapes.get(opnds[0], [])
            kshape = shapes.get(opnds[1], [])
            llabels, klabels, olabels = dl.groups()  # e.g. b01f, 01io, b01f
            if len(kshape) != len(klabels) or len(out_dims) != len(olabels):
                continue
            spatial = sorted(c for c in klabels if c.isdigit())
            if spatial and len(lshape) != len(llabels):
                continue  # need lhs spatial extents for windowed counting
            k_i = _prod([d for d, lab in zip(kshape, klabels) if lab == "i"])
            out_nonspatial = _prod(
                [d for d, lab in zip(out_dims, olabels) if not lab.isdigit()])
            win = _parse_window(
                (_WINDOW_RE.search(ln) or [None, ""])[1], len(spatial))
            f = 2.0 * out_nonspatial * k_i
            for di, c in enumerate(spatial):
                O = out_dims[olabels.index(c)]
                S = kshape[klabels.index(c)]
                I = lshape[llabels.index(c)]
                # window sizes override kernel dims when present (reversal
                # and dilation live there too)
                S = win["size"][di] if win["size"][di] != 1 or S == 1 else S
                f *= _conv_taps(O, S, I, win["stride"][di],
                                win["pad_lo"][di], win["lhs_dilate"][di],
                                win["rhs_dilate"][di])
            flops_by_op["convolution"] += f
            flops_by_stage[_stage_of(ln)] += f

    return {
        "flops_by_op": dict(flops_by_op),
        "flops_by_stage": dict(flops_by_stage),
        "counts_by_op": dict(counts_by_op),
        "bytes_by_op": dict(bytes_by_op),
    }


def detailed_flops(fn: Callable, *args, compiled=None) -> Dict[str, object]:
    """Compile fn(*args) and report the per-op breakdown + coverage.

    ``coverage`` = parsed dot+conv FLOPs / cost_analysis() total; the gap is
    non-matmul FLOPs (reduces, elementwise in fusions) plus any conv-padding
    accounting difference.
    """
    import jax

    if compiled is None:
        compiled = jax.jit(fn).lower(*args).compile()
    report = parse_hlo_flops(compiled.as_text())
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        total = float(cost.get("flops", float("nan")))
    except Exception:
        total = float("nan")
    parsed = sum(report["flops_by_op"].values())
    report["total_flops_cost_analysis"] = total
    report["coverage"] = parsed / total if total == total and total else None
    return report


def format_report(report: Dict[str, object], top: int = 12) -> str:
    out = []
    ca = report.get("total_flops_cost_analysis") or float("nan")
    out.append(f"  total (cost_analysis): {ca/1e9:.2f} GFLOP"
               + (f", matmul/conv coverage {report['coverage']*100:.1f}%"
                  if report.get("coverage") else ""))
    for op, f in sorted(report["flops_by_op"].items(), key=lambda kv: -kv[1]):
        n = report["counts_by_op"].get(op, 0)
        out.append(f"  {op:<14} {f/1e9:10.2f} GFLOP  ({n} instrs)")
    stages = sorted(report["flops_by_stage"].items(), key=lambda kv: -kv[1])
    for stage, f in stages[:top]:
        out.append(f"    {stage:<40} {f/1e9:8.2f} GFLOP")
    if len(stages) > top:
        rest = sum(f for _, f in stages[top:])
        out.append(f"    {'(other stages)':<40} {rest/1e9:8.2f} GFLOP")
    return "\n".join(out)
