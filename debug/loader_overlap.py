"""Input-pipeline vs device overlap measurement (VERDICT r1 #10).

Sintel data is not present in this environment, so a synthetic stand-in
reproduces its per-sample host work profile (cv2 decode-surrogate + resize
+ normalize at native 436x1024 -> config 256x512, like data/sintel.py) and
we measure:

  1. loader-only throughput (batches/s) at num_workers = 0 / 2 / 4
  2. device-only train step rate (cached batch)
  3. end-to-end loop rate with the prefetching loader

Overlap is good when (3) ~= min over the two rates rather than the serial
sum.  Results go into PERF.md.

Usage: python -m debug.loader_overlap  (run from repo root; TPU device)
"""

from __future__ import annotations

import time

import numpy as np


class SyntheticSintel:
    """Per-item host work modeled on data/sintel.py __getitem__: decode
    (here: PRNG fill of the native-res buffer), cv2 resize to the config
    size, normalize, flow rescale."""

    def __init__(self, size: int = 512, out_hw=(256, 512)):
        self.size = size
        self.out_hw = out_hw
        self._native = (436, 1024)

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int):
        try:
            import cv2
        except ImportError:
            cv2 = None
        rng = np.random.default_rng(idx)
        H, W = self._native
        h, w = self.out_hw
        frames = []
        for _ in range(2):
            raw = rng.integers(0, 255, (H, W, 3), np.uint8)
            if cv2 is not None:
                img = cv2.resize(raw, (w, h)).astype(np.float32) / 255.0
            else:
                ys = (np.arange(h) * H // h)
                xs = (np.arange(w) * W // w)
                img = raw[ys][:, xs].astype(np.float32) / 255.0
            img = (img - 0.45) / 0.225
            frames.append(img)
        flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 4
        return frames[0], frames[1], flow


def main():
    import jax

    from opticalflowdiffusion_tpu.data.loader import DataLoader
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step
    from bench import _make_algo

    batch = 2
    ds = SyntheticSintel(size=64)

    print("== loader-only throughput (batches/s), Sintel-profile samples ==")
    rates = {}
    for nw in (0, 2, 4):
        loader = DataLoader(ds, batch_size=batch, shuffle=False, seed=0,
                            num_workers=nw)
        it = iter(loader)
        next(it)  # warm the pipeline
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += 1
        dt = time.perf_counter() - t0
        rates[nw] = n / dt
        print(f"  num_workers={nw}: {rates[nw]:.2f} batches/s")

    print("== device-only train step (cached batch) ==")
    algo = _make_algo(128, 1000, "bfloat16")
    mesh = meshlib.make_mesh()
    loader = DataLoader(ds, batch_size=batch, shuffle=False, seed=0,
                        num_workers=2)
    first = next(iter(loader))
    key = jax.random.PRNGKey(0)
    state = algo.init(key, first, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gbatch = meshlib.shard_batch(mesh, first)
    state, m = step(state, gbatch, key)
    float(m["train/loss"])  # compile
    t0 = time.perf_counter()
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, m = step(state, gbatch, sub)
    float(m["train/loss"])
    dev_rate = 8 / (time.perf_counter() - t0)
    print(f"  device-only: {dev_rate:.2f} steps/s")

    print("== end-to-end loop (loader + device) ==")
    for nw in (0, 2):
        loader = DataLoader(ds, batch_size=batch, shuffle=False, seed=0,
                            num_workers=nw)
        it = iter(loader)
        state, m = step(state, meshlib.shard_batch(mesh, next(it)), key)
        float(m["train/loss"])
        t0 = time.perf_counter()
        n = 0
        for b in it:
            key, sub = jax.random.split(key)
            state, m = step(state, meshlib.shard_batch(mesh, b), sub)
            n += 1
        float(m["train/loss"])
        e2e = n / (time.perf_counter() - t0)
        bound = min(rates[nw], dev_rate)
        print(
            f"  num_workers={nw}: {e2e:.2f} steps/s "
            f"({100 * e2e / bound:.0f}% of the min(loader, device) bound)"
        )


if __name__ == "__main__":
    main()
