#!/usr/bin/env python
"""Per-op roofline closure table for the flagship train step.

VERDICT r4 item 3: the single-chip headline has plateaued at ~109 ms —
either squeeze the remaining ~31 ms band of per-half BN-split/backward +
D-gradient fusions, or PROVE the remainder is within ~15% of its
hardware roofline so the perf axis can be closed with evidence. This tool
produces that proof (or names the next target):

1. compiles the production step (512², B8, T=8 MC, bf16) and parses the
   optimized HLO: every instruction's output bytes, every fusion's
   operand bytes (HBM traffic model: unique operands read once + outputs
   written once), and every convolution's MACs (from operand/window
   dims, incl. feature_group_count for depthwise);
2. captures a jax.profiler device trace and aggregates per-op time
   (utils/xplane.py — per-op *durations* are device-side and immune to
   host scheduling noise);
3. for every op >= `--floor` ms/step, computes the roofline time
   max(bytes / HBM_BW, flops / MXU_peak) and the achieved fraction
   roofline_ms / measured_ms.

Ops below the floor are summed as a tail. The closure claim is the table
itself: each heavy op's achieved fraction, with the known-irreducible
ones (conv-with-BN-moment fusions ~85% MXU) called out.

Usage:
    python tools/roofline_closure.py [--steps 5] [--floor 1.0]
        [--out docs/roofline_closure.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_SHAPE_LAYOUT_RE = re.compile(r"(\w+)\[([0-9,]*)\](?:\{([^}]*)\})?")
_TILE_RE = re.compile(r"T\(([0-9,]+)\)")


def _padded_elems(dims: list[int], layout: str | None) -> int:
    """Element count AFTER the TPU tiling pads the minor dims: layout
    '{3,0,2,1:T(8,128)(2,1)}' tiles the two minor-most dims (here C then
    N) to (8,128), with '(2,1)' packing doubling the sublane tile for
    16-bit types. Low-channel NHWC tensors (C=1..32) therefore move up to
    128/C x the raw bytes — the achievable roofline, not a fixable
    inefficiency."""
    n = 1
    for d in dims:
        n *= d
    if not layout or ":T(" not in layout:
        return n
    try:
        order = [int(x) for x in layout.split(":")[0].split(",")]
    except ValueError:
        return n
    tm = _TILE_RE.search(layout)
    if not tm or len(order) != len(dims):
        return n
    tiles = [int(x) for x in tm.group(1).split(",")]
    if len(tiles) >= 2 and ")(2,1)" in layout:
        tiles[-2] *= 2  # bf16 sublane packing
    padded = list(dims)
    # `order` is minor-to-major; tiles apply to the len(tiles) minor dims,
    # listed major-to-minor
    for dim_idx, tile in zip(order[: len(tiles)], reversed(tiles)):
        padded[dim_idx] = -(-padded[dim_idx] // tile) * tile
    n = 1
    for d in padded:
        n *= d
    return n


def shape_bytes(text: str, padded: bool = False) -> int:
    """Total bytes of every dtype[dims] shape token in `text` (handles
    tuples by summing elements); ``padded=True`` counts the tile-padded
    footprint the hardware actually streams."""
    total = 0
    for dtype, dims_s, layout in _SHAPE_LAYOUT_RE.findall(text):
        if dtype not in DTYPE_BYTES:
            continue
        dims = [int(d) for d in dims_s.split(",") if d]
        n = _padded_elems(dims, layout) if padded else int(np.prod(dims)) if dims else 1
        total += n * DTYPE_BYTES[dtype]
    return total


_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(.*)$")
_OPERAND_SPLIT_RE = re.compile(r"\(([^)]*(?:\([^)]*\)[^)]*)*)\)")
_WINDOW_SIZE_RE = re.compile(r"size=([0-9x]+)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")


_CALLS_RE = re.compile(r"calls=%([\w.-]+)")
_PARAM_RE = re.compile(r"%?([\w.-]+): (\w+\[[0-9,]*\])")
_DIM_LABELS_RE = re.compile(r"dim_labels=\w+_(\w+)->")
_OPERANDS_RE = re.compile(r"%([\w.-]+)")


def _first_dims(shape_text: str | None) -> list[int] | None:
    if not shape_text:
        return None
    m = _SHAPE_RE.search(shape_text)
    if not m:
        return None
    return [int(d) for d in m.group(2).split(",") if d]


def parse_hlo(hlo: str):
    """name -> {out_bytes, operand_bytes, flops, opcode} for every
    instruction definition. Fusions inherit the conv FLOPs of their
    called computation (TPU XLA fuses convolutions into kOutput fusions —
    e.g. the MC boundary-head conv+BN-moment fusions — so top-level conv
    defs alone would miss nearly all MXU work). Conv MACs come from the
    output shape x the kernel's non-output dims (the kernel 'i' dim is
    already Cin/groups in HLO), with kernel shapes resolved through a
    global symbol table because fusion-body operands carry no inline
    shapes. Dot ops (the matmul-lowered align-corners resizes) stay on
    the byte model."""
    # pass 1: global symbol table (instruction defs + computation params)
    shape_of: dict[str, str] = {}
    for line in hlo.splitlines():
        stripped = line.strip()
        if stripped.endswith("{"):
            for pname, pshape in _PARAM_RE.findall(stripped):
                shape_of[pname] = pshape
            continue
        m = _DEF_RE.match(line)
        if m and "[" in line:
            rhs = m.group(2)
            opm = re.search(r"\)?\s*([a-z][\w-]*)\(", rhs)
            head = rhs.split(opm.group(1) + "(", 1)[0] if opm else rhs
            shape_of[m.group(1)] = head

    def conv_flops(rhs: str, head: str) -> int:
        dm = _DIM_LABELS_RE.search(rhs)
        out_dims = _first_dims(head)
        if not (dm and out_dims):
            return 0
        args_text = rhs.split("(", 1)[1] if "(" in rhs else ""
        ops = _OPERANDS_RE.findall(args_text.split(", window=")[0])
        if len(ops) < 2:
            return 0
        kdims = _first_dims(shape_of.get(ops[1]))
        kspec = dm.group(1)  # e.g. "01io", "oi01"
        if not kdims or len(kdims) != len(kspec):
            return 0
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        k = 1
        for ch, d in zip(kspec, kdims):
            if ch != "o":
                k *= d
        return 2 * out_elems * k

    info: dict[str, dict] = {}
    comp_flops: dict[str, int] = {}
    pending_calls: list[tuple[str, str]] = []  # (fusion name, computation)
    current_comp = None
    for line in hlo.splitlines():
        stripped = line.strip()
        if stripped.endswith("{"):
            nm = re.match(r"(?:ENTRY\s+)?%?([\w.-]+)", stripped)
            current_comp = nm.group(1) if nm else None
            if current_comp is not None:
                comp_flops.setdefault(current_comp, 0)
            continue
        m = _DEF_RE.match(line)
        if not m or "=" not in line or "[" not in line:
            continue
        name, rhs = m.group(1), m.group(2)
        opm = re.search(r"\)?\s*([a-z][\w-]*)\(", rhs)
        opcode = opm.group(1) if opm else ""
        head = rhs.split(opcode + "(", 1)[0] if opcode else rhs
        ob = shape_bytes(head)
        ob_p = shape_bytes(head, padded=True)
        operand_b = shape_bytes(rhs[len(head):])
        operand_b_p = shape_bytes(rhs[len(head):], padded=True)
        if operand_b == 0 and opcode:
            # fusion-body operands have no inline shapes — resolve names
            args_text = rhs[len(head) + len(opcode) + 1:]
            ops_named = _OPERANDS_RE.findall(args_text.split("metadata=")[0])
            operand_b = sum(shape_bytes(shape_of.get(op, "")) for op in ops_named)
            operand_b_p = sum(
                shape_bytes(shape_of.get(op, ""), padded=True) for op in ops_named)
        flops = conv_flops(rhs, head) if opcode == "convolution" else 0
        if current_comp is not None and flops:
            comp_flops[current_comp] += flops
        if opcode == "fusion":
            cm = _CALLS_RE.search(rhs)
            if cm:
                pending_calls.append((name, cm.group(1)))
        info[name] = {"out_bytes": ob, "operand_bytes": operand_b,
                      "out_bytes_p": ob_p, "operand_bytes_p": operand_b_p,
                      "flops": flops, "opcode": opcode}
    for fusion_name, comp in pending_calls:
        if comp in comp_flops and fusion_name in info:
            info[fusion_name]["flops"] += comp_flops[comp]
    return info


def main():
    from uda_clr_tpu.utils.benchmarking import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--floor", type=float, default=1.0, help="ms/step table floor")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace-dir", default="/tmp/uda_roofline_trace")
    ap.add_argument("--out", default="docs/roofline_closure.csv")
    args = ap.parse_args()

    import jax.numpy as jnp

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.models.layers import set_dropout_impl
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step
    from uda_clr_tpu.utils.devinfo import peak_hbm_gbs, peak_tflops
    from uda_clr_tpu.utils.xplane import latest_trace, op_totals

    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))
    size, batch = args.size, args.batch
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm="bn", dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    rng = np.random.default_rng(0)
    data = {
        "image_s": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
        "map_s": (rng.uniform(0, 1, (batch, size, size, 2)) > 0.5).astype(np.float32),
        "boundary_s": rng.uniform(0, 1, (batch, size, size, 1)).astype(np.float32),
        "image_t": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
    }
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    print("# compiling + parsing HLO...", file=sys.stderr, flush=True)
    compiled = step.lower(state, data, 1e-3, 2.5e-5, 30).compile()
    hlo_info = parse_hlo(compiled.as_text())

    state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])
    for _ in range(2):
        state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])

    print(f"# tracing {args.steps} steps...", file=sys.stderr, flush=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])
    jax.profiler.stop_trace()

    rows_t = op_totals(latest_trace(args.trace_dir), top=100000)
    kind = jax.devices()[0].device_kind
    hbm = peak_hbm_gbs(kind) or 819.0
    mxu = (peak_tflops(kind) or 197.0) * 1e12

    # Trace event names are the (width-truncated) HLO definition text for
    # op events ("%fusion.352 = bf16[...] fusion(..."), plus line/module
    # aggregates ("jit_step(...)", bare numbers). Take the instruction
    # NAME from the event text and look its shapes up in the parsed HLO;
    # async prefetch ops (copy/slice-start) overlap compute, so their
    # durations are accounted separately, not in the sync closure table.
    table, tail_ms, sync_ms, async_ms, step_ms, matched = [], 0.0, 0.0, 0.0, None, 0
    tail_roof_ms = tail_matched_ms = 0.0
    for raw, ms_total, cnt in rows_t:
        ms = ms_total / args.steps
        if raw.startswith("jit_step"):
            step_ms = ms
            continue
        if not raw.startswith("%"):
            continue  # line/core aggregates double-count the op events
        name = raw[1:].split(" = ", 1)[0]
        if "-start" in name.split(".")[0]:
            async_ms += ms
            continue
        sync_ms += ms
        inf = hlo_info.get(name)
        if inf is not None:
            matched += 1
        if ms < args.floor:
            tail_ms += ms
            if inf is not None:
                nb_p = inf["operand_bytes_p"] + inf["out_bytes_p"]
                tail_roof_ms += max(nb_p / (hbm * 1e9) * 1e3,
                                    inf["flops"] / mxu * 1e3)
                tail_matched_ms += ms
            continue
        if inf is None:
            table.append({"op": name, "ms": round(ms, 2), "kind": "?",
                          "gbytes": "", "gbytes_padded": "", "flops_g": "",
                          "roofline_ms": "", "achieved_frac": "",
                          "achieved_frac_padded": ""})
            continue
        nbytes = inf["operand_bytes"] + inf["out_bytes"]
        nbytes_p = inf["operand_bytes_p"] + inf["out_bytes_p"]
        t_mem_ms = nbytes / (hbm * 1e9) * 1e3
        t_mem_p_ms = nbytes_p / (hbm * 1e9) * 1e3
        t_flop_ms = inf["flops"] / mxu * 1e3
        roof = max(t_mem_ms, t_flop_ms)
        roof_p = max(t_mem_p_ms, t_flop_ms)
        table.append({
            "op": name,
            "ms": round(ms, 2),
            "kind": ("mxu" if t_flop_ms > t_mem_ms else "hbm"),
            "gbytes": round(nbytes / 1e9, 3),
            "gbytes_padded": round(nbytes_p / 1e9, 3),
            "flops_g": round(inf["flops"] / 1e9, 1),
            "roofline_ms": round(roof, 2),
            "achieved_frac": round(roof / ms, 3) if ms > 0 else "",
            "achieved_frac_padded": round(roof_p / ms, 3) if ms > 0 else "",
        })

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(table[0]))
        w.writeheader()
        w.writerows(table)

    print(f"# device_kind={kind} hbm={hbm} GB/s peak={mxu/1e12} TFLOP/s")
    print(f"# module step time {step_ms:.1f} ms; sync op time {sync_ms:.1f} "
          f"ms/step ({len(table)} ops >= {args.floor} ms = "
          f"{sync_ms - tail_ms:.1f} ms, tail {tail_ms:.1f} ms); async "
          f"prefetch (overlapped) {async_ms:.1f} ms; hlo-matched "
          f"{matched} heavy ops")
    if tail_matched_ms > 0:
        print(f"# tail aggregate: {tail_matched_ms:.1f} ms measured "
              f"(hlo-matched part) vs {tail_roof_ms:.1f} ms padded-roofline "
              f"=> aggregate achieved frac {tail_roof_ms / tail_matched_ms:.2f}")
    hdr = (f"{'ms':>7} {'kind':>4} {'GB':>7} {'GBpad':>7} {'GFLOP':>8} "
           f"{'roof_ms':>8} {'frac':>6} {'fr_pad':>6}  op")
    print(hdr)
    for r in sorted(table, key=lambda r: -r["ms"]):
        print(f"{r['ms']:7.2f} {r['kind']:>4} {r['gbytes']!s:>7} "
              f"{r['gbytes_padded']!s:>7} {r['flops_g']!s:>8} "
              f"{r['roofline_ms']!s:>8} {r['achieved_frac']!s:>6} "
              f"{r['achieved_frac_padded']!s:>6}  {r['op'][:70]}")
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
