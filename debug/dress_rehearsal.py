"""Full-res real-dataset-layout dress rehearsal (VERDICT r2 missing #3).

Raw Sintel / FlyingChairs / KITTI data is absent from this environment, so
this script generates native-layout synthetic fixture trees
(data/fixtures.py) and drives the PRODUCTION path end-to-end against them:
``main.py`` -> config compose -> experiment loop -> production loaders at
the native resolutions -> train ~N steps -> validate (full sampling) ->
checkpoint -> RESUME -> train past the restored step.

It also measures input-pipeline health at native res: loader-only
throughput (samples/s the worker pool can decode+resize) vs the train
step's consumption rate — the loader/device overlap evidence
(reference exp_base.py:135-169 DataLoader worker semantics).

Usage:
    python debug/dress_rehearsal.py --dataset sintel --steps 50
    python debug/dress_rehearsal.py --dataset chairs --steps 50
    python debug/dress_rehearsal.py --dataset kitti  --steps 50
    python debug/dress_rehearsal.py --all --steps 50

Writes one JSON line per dataset; exercise happens wherever run (CPU ok,
TPU for the PERF row).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


# dataset -> (fixture builder kwargs, main.py overrides at NATIVE res padded
# to the UNet's /8 divisibility, loader batch)
RECIPES = {
    "sintel": dict(
        image_size="1024,448",  # native 1024x436 padded to /8 (bench.py rule)
        dataset="sintel",
        batch=2,
    ),
    "chairs": dict(
        image_size="512,384",  # native FlyingChairs resolution
        dataset="flying_chairs",
        batch=2,
    ),
    "kitti": dict(
        image_size="1248,376",  # native 1242x375 padded to /8
        dataset="kitti_single",
        batch=2,
    ),
}


def _build_fixture(name: str, root: Path) -> None:
    from opticalflowdiffusion_tpu.data import fixtures

    if name == "sintel":
        # >= 12 frames/scene so the scan fallback's 90/10 split (every 10th
        # middle frame -> validation) yields a non-empty validation split
        fixtures.make_sintel_fixture(root, scenes=2, frames=13)
    elif name == "chairs":
        fixtures.make_chairs_fixture(root, n=8)
    elif name == "kitti":
        fixtures.make_kitti_fixture(root, n=6)


def _loader_throughput(name: str, image_size: str, root: Path,
                       batch: int, n_batches: int = 6) -> float:
    """Samples/s the production DataLoader (worker pool) delivers at native
    res, independent of the device."""
    from opticalflowdiffusion_tpu.config import Config
    from opticalflowdiffusion_tpu.data.loader import DataLoader

    cfg = Config(dict(image_size=image_size, root=str(root), name=name))
    if name == "sintel":
        from opticalflowdiffusion_tpu.data.sintel import SintelDataset as DS
    elif name == "chairs":
        from opticalflowdiffusion_tpu.data.flying_chairs import (
            FlyingChairsDataset as DS,
        )
    else:
        from opticalflowdiffusion_tpu.data.kitti_single import (
            KittiSingleDataset as DS,
        )
    ds = DS(cfg, split="training")
    loader = DataLoader(ds, batch_size=batch, shuffle=True, seed=0,
                        num_workers=4)
    it = iter(loader)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    n = 0
    for i, b in enumerate(it):
        n += len(b[0])
        if i + 1 >= n_batches:
            break
    dt = time.perf_counter() - t0
    return n / dt if dt > 0 else float("inf")


def _run_main(cwd: Path, env: dict, overrides: list, tag: str) -> float:
    """Run main.py with overrides; return wall seconds; raise on failure."""
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, str(REPO / "main.py"), *overrides],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"{tag}: main.py failed rc={proc.returncode}")
    return wall


def rehearse(name: str, steps: int, workdir: Path,
             small: bool = False) -> dict:
    rec = dict(RECIPES[name])
    if small:
        # CPU-feasible validation of the SAME driver/loader path (the
        # native-res PERF row runs on the chip without this flag)
        rec["image_size"] = "64,32"
    data_root = workdir / "data"
    data_root.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    _build_fixture(name, data_root)
    fixture_s = time.perf_counter() - t0

    loader_sps = _loader_throughput(
        name, rec["image_size"], data_root, rec["batch"]
    )

    run_cwd = workdir / "run"
    run_cwd.mkdir(exist_ok=True)
    env = dict(os.environ)
    env["OFD_ARTIFACT_ROOT"] = str(workdir / "artifacts")
    overrides = [
        "experiment=matrix_flow",
        f"dataset={rec['dataset']}",
        "algorithm=flow_diffuser",
        f"dataset.image_size={rec['image_size']}",
        f"dataset.root={data_root}",
        f"algorithm.image_size={rec['image_size'].split(',')[0]}",
        "algorithm.flow_max=32",
        "algorithm.sampling_timesteps=50",
        f"experiment.training.data.batch_size={rec['batch']}",
        f"experiment.validation.data.batch_size={rec['batch']}",
        f"experiment.training.max_steps={steps}",
        f"experiment.validation.check_interval={steps - 2}",
        "experiment.validation.limit_batch=1",
        f"experiment.training.checkpointing.every_n_train_steps={steps // 2}",
    ]
    train_wall = _run_main(run_cwd, env, overrides, f"{name}-train")

    # locate the checkpoint dir main.py wrote, then RESUME past it
    out_root = run_cwd / "outputs"
    ckpts = sorted(out_root.glob("*/*/checkpoints"))
    if not ckpts:
        raise RuntimeError(f"{name}: no checkpoints written under {out_root}")
    ckpt = ckpts[-1]
    resumed_steps = steps + max(steps // 5, 2)
    resume_wall = _run_main(
        run_cwd, env,
        overrides
        + [f"+wandb.resume={ckpt}",
           f"experiment.training.max_steps={resumed_steps}"],
        f"{name}-resume",
    )
    metrics_files = sorted(out_root.glob("*/*/metrics.jsonl"))
    val_keys = []
    last_train = {}
    for mf in metrics_files:
        for line in mf.read_text().splitlines():
            rec_ = json.loads(line)
            if any(k.startswith("val/") for k in rec_):
                val_keys = sorted(k for k in rec_ if k.startswith("val/"))
            if any(k.startswith("train/") for k in rec_):
                last_train = rec_
    result = dict(
        dataset=name,
        image_size=rec["image_size"],
        steps=steps,
        resumed_to=resumed_steps,
        fixture_s=round(fixture_s, 1),
        loader_samples_per_sec=round(loader_sps, 2),
        train_wall_s=round(train_wall, 1),
        resume_wall_s=round(resume_wall, 1),
        # step rate incl. compile; the loader/step overlap verdict:
        train_samples_per_sec_incl_compile=round(
            steps * rec["batch"] / train_wall, 3
        ),
        val_metric_keys=val_keys,
        last_train_record=last_train,
        ok=True,
    )
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=list(RECIPES), default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--keep", action="store_true",
                    help="keep the temp workdir")
    ap.add_argument("--small", action="store_true",
                    help="64x32 images (CPU-feasible driver validation)")
    ap.add_argument("--out", default=None,
                    help="append JSON results to this file")
    args = ap.parse_args()
    names = list(RECIPES) if args.all else [args.dataset or "sintel"]
    results = []
    for name in names:
        workdir = Path(tempfile.mkdtemp(prefix=f"rehearsal-{name}-"))
        print(f"[rehearsal] {name} in {workdir}")
        try:
            res = rehearse(name, args.steps, workdir, small=args.small)
        except Exception as e:  # keep going; report the failure
            res = dict(dataset=name, ok=False, error=repr(e)[:500])
        print(json.dumps(res))
        results.append(res)
        if args.out:
            # append per-leg: a later leg's timeout must not lose the
            # finished legs' rows (the r05 run lost sintel+chairs this way)
            with open(args.out, "a") as fh:
                fh.write(json.dumps(res) + "\n")
        if not args.keep:
            import shutil

            shutil.rmtree(workdir, ignore_errors=True)
    if not all(r.get("ok") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
