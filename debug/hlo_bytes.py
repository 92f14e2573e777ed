"""HBM-byte accounting of the native-res sampler's optimized HLO.

Walks the scan while-body computation of the compiled (cache-hit) native
448x1024 b2 DDIM program and sums operand+output bytes per top-level
instruction — the HBM traffic XLA's own cost model charges — bucketed by
op kind, by tensor resolution, and by UNet module path (from op_name
metadata).  This is the map the round-5 byte-reduction work targets.

Usage:
  python debug/hlo_bytes.py --hlo /tmp/native_hlo.txt   # parse a dump
  python debug/hlo_bytes.py                             # compile + parse
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DT_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# instruction line inside a computation body
INST_RE = re.compile(
    r"^\s+(?:ROOT )?%([\w.-]+) = ((?:\([^)]*\)|\S+?)(?:\{[^}]*\})?) "
    r"([\w-]+)\(([^)]*)\)(.*)$"
)


def shape_bytes(stext: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(stext):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def get_hlo_text(args) -> str:
    if args.hlo:
        return open(args.hlo).read()
    import jax
    import jax.numpy as jnp

    from bench import _make_algo, _setup_cache
    from opticalflowdiffusion_tpu.models import diffusion as dm

    _setup_cache()
    B, H, W = args.batch, args.H, args.W
    algo = _make_algo(128, 1000, args.precision,
                      sampling_timesteps=args.ddim_steps)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, H, W, algo.channels), jnp.float32)
    cond = jnp.zeros((B, H, W, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(algo.module.init)(rng, x, cond, t, None)["params"]

    @jax.jit
    def run(params, cond, rng):
        img, _ = dm.ddim_sample(
            algo.sched, algo._model_fn(params), rng,
            (B, H, W, algo.channels), external_cond=cond,
        )
        return jnp.sum(img.astype(jnp.float32))

    return run.lower(params, cond, rng).compile().as_text()


MODULE_RE = re.compile(
    r"(ResnetBlock_\d+|LinearAttentionBlock_\d+|Attention_\d+|Conv_\d+|"
    r"Downsample_\d+|Upsample_\d+|Dense_\d+)"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", default="")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--H", type=int, default=448)
    ap.add_argument("--W", type=int, default=1024)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    txt = get_hlo_text(args)

    # split into computations; the while body is the one with the most
    # while/body op_name instructions
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w.-]+) \(.*\) -> .* \{$", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line)
    body_name = max(
        comps,
        key=lambda c: sum("while/body" in ln for ln in comps[c]),
    )
    body = comps[body_name]
    print(f"while-body computation: {body_name} ({len(body)} lines)")

    shape_of = {}
    insts = []
    for ln in body:
        m = INST_RE.match(ln)
        if not m:
            continue
        name, stext, op, operands, rest = m.groups()
        shape_of[name] = stext
        insts.append((name, stext, op, operands, rest))

    by_op = collections.Counter()
    by_res = collections.Counter()
    by_mod = collections.Counter()
    per_inst = []
    total = 0
    for name, stext, op, operands, rest in insts:
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "while", "after-all", "iota"):
            continue
        out_b = shape_bytes(stext)
        opnd_b = 0
        for o in re.findall(r"%([\w.-]+)", operands):
            if o in shape_of:
                opnd_b += shape_bytes(shape_of[o])
        tot = out_b + opnd_b
        total += tot
        by_op[op] += tot
        dm_ = re.search(r"\[(\d+),(\d+),(\d+),(\d+)\]", stext)
        by_res[f"{dm_.group(2)}x{dm_.group(3)}" if dm_ else "other"] += tot
        mm = MODULE_RE.search(rest)
        by_mod[mm.group(1) if mm else "(sampler/other)"] += tot
        src = re.search(r'op_name="[^"]*/([^"/]+)"', rest)
        per_inst.append(
            (tot, f"{op:20s} {stext[:48]:48s} {name[:28]:28s} "
                  f"{(mm.group(1) + '/') if mm else ''}"
                  f"{src.group(1)[:40] if src else ''}")
        )

    print(f"while-body total operand+output bytes: {total / 1e9:.2f} GB/step")
    print("\nby op kind:")
    for op, b in by_op.most_common(15):
        print(f"  {op:28s} {b / 1e9:7.2f} GB  {100 * b / total:5.1f}%")
    print("\nby output resolution:")
    for resk, b in by_res.most_common(12):
        print(f"  {resk:12s} {b / 1e9:7.2f} GB  {100 * b / total:5.1f}%")
    print("\nby module:")
    for mod, b in by_mod.most_common(20):
        print(f"  {mod:28s} {b / 1e9:7.2f} GB  {100 * b / total:5.1f}%")
    print(f"\ntop {args.top} instructions by bytes:")
    for tot, desc in sorted(per_inst, reverse=True)[: args.top]:
        print(f"  {tot / 1e6:9.1f} MB  {desc}")


if __name__ == "__main__":
    main()
