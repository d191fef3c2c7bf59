#!/usr/bin/env python
"""Train the conditional diffusion model (reference main.py equivalent).

Usage:
    python scripts/train.py [--config configs/mnist_train.yaml] [--steps N]

Accepts both this framework's structured YAML and the reference's flat
config_train.yaml format (auto-detected).  Reference flow (main.py:17-28):
seed 42, build Unet + GaussianDiffusion + Trainer, trainer.train().
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def load_config(path):
    import yaml

    from localdiffusion_tpu.config import Config, reference_dict_to_config

    with open(path) as f:
        raw = yaml.safe_load(f)
    if "model" in raw and isinstance(raw.get("model"), dict):
        return Config.from_dict(raw)
    return reference_dict_to_config(raw)


def build_dataset(cfg):
    from localdiffusion_tpu.data import MNISTDataset, load_mnist_arrays, synthetic_digits

    name = cfg.data.name
    if name == "mnist":
        try:
            imgs, labels = load_mnist_arrays(
                cfg.data.mnist_path, cfg.data.mnist_labels_path
            )
        except (FileNotFoundError, OSError):
            print("MNIST files not found — using synthetic digits")
            imgs, labels = synthetic_digits(
                2048, size=cfg.diffusion.image_size, seed=42
            )
        # reference 70% train split over digit-8 images (ddpm.py:1330-1359)
        n = len(imgs)
        split = int(0.7 * n)
        train_ds = MNISTDataset(imgs[:split], labels[:split], num=[8])
        test_ds = MNISTDataset(imgs[split:], labels[split:], num=[8], max_file=100)
        return train_ds.as_arrays()[:2], test_ds.as_arrays()[:2]
    if name == "synthetic_brain":
        from localdiffusion_tpu.data.synthetic import synthetic_brain_translation

        d = cfg.data
        size = cfg.diffusion.image_size
        hr, lr, _ = synthetic_brain_translation(
            256, size, tumor=False, seed=42,
            mean_t1=d.mean_t1, std_t1=d.std_t1,
            mean_flair=d.mean_flair, std_flair=d.std_flair,
            translate_zero=d.translate_zero,
        )
        hr_te, lr_te, _ = synthetic_brain_translation(
            32, size, tumor=False, seed=7,
            mean_t1=d.mean_t1, std_t1=d.std_t1,
            mean_flair=d.mean_flair, std_flair=d.std_flair,
            translate_zero=d.translate_zero,
        )
        return (hr, lr), (hr_te, lr_te)
    if name.startswith("synthetic_texture"):
        from localdiffusion_tpu.data.mvtec import salt_and_pepper, sr_degrade
        from localdiffusion_tpu.data.synthetic import synthetic_textures

        denoise = name.endswith("denoise")  # s&p conditioning (data.py:248-277)
        size = cfg.diffusion.image_size

        def degrade(im2, i):
            if denoise:
                return salt_and_pepper(im2 / 2.0, seed=i) * 2.0
            return sr_degrade(im2)

        imgs, _ = synthetic_textures(192, size=size, seed=42)
        imgs2 = imgs * 2.0  # [0, 2] like the mvtec loaders (data.py:294-297)
        lr = np.stack([degrade(im, i) for i, im in enumerate(imgs2)])
        imgs_te, _ = synthetic_textures(24, size=size, seed=7)
        hr_te = imgs_te * 2.0
        lr_te = np.stack([degrade(im, 1000 + i) for i, im in enumerate(hr_te)])
        return (imgs2, lr), (hr_te, lr_te)
    if name == "synthetic":
        from localdiffusion_tpu.data import synthetic_digits

        imgs, labels = synthetic_digits(
            512, size=cfg.diffusion.image_size, seed=42, digit=8
        )
        ds = MNISTDataset(imgs, labels, lr_mode="full")
        hr, lr, _ = ds.as_arrays()
        return (hr[:400], lr[:400]), (hr[400:], lr[400:])
    if name == "mri":
        import glob

        from localdiffusion_tpu.data import BRATSPngDataset

        files = np.array(sorted(glob.glob(cfg.data.mri_files)))
        np.random.seed(42)
        np.random.shuffle(files)  # reference seeded shuffle (test.py:71-73)
        split = int(0.5 * len(files))
        tr = BRATSPngDataset(cfg.data, files[:split], train=True,
                             crop=cfg.diffusion.image_size)
        te = BRATSPngDataset(cfg.data, files[split:], train=False, tumor=False,
                             crop=cfg.diffusion.image_size)
        hr, lr, _ = tr.as_arrays()
        hr_te, lr_te, _ = te.as_arrays()
        return (hr, lr), (hr_te, lr_te)
    if "mvtec" in name:
        import glob

        from localdiffusion_tpu.data import MvtecDatasetSR

        files = np.array(sorted(glob.glob(cfg.data.mvtec_path)))
        np.random.seed(42)
        np.random.shuffle(files)
        tr = MvtecDatasetSR(files, train=True, size=cfg.diffusion.image_size)
        te = MvtecDatasetSR(files, train=False, size=cfg.diffusion.image_size,
                            max_num=24)
        hr, lr, _, _ = tr.as_arrays()
        hr_te, lr_te, _, _ = te.as_arrays()
        return (hr, lr), (hr_te, lr_te)
    raise NotImplementedError(f"unknown dataset {name}")


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config_train.yaml")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="default: cfg.train.batch_size (a silent 64 here "
                         "once OOMed 256px training; the config must win)")
    ap.add_argument("--results", default=None)
    ap.add_argument(
        "--step-mode",
        choices=["epoch", "batch", "resident"],
        default="resident",
        help="'resident' = device-resident epoch scan (one device call per "
        "epoch, reference accumulation semantics); 'epoch' = streamed "
        "accumulation; 'batch' = one optimizer step per batch",
    )
    ap.add_argument("--eval-every", type=int, default=None)
    ap.add_argument(
        "--resume", choices=["auto", "never"], default="auto",
        help="auto-resume from model-latest if present (TPU preemption "
        "recovery; the reference's recovery is manual Trainer.load, "
        "SURVEY.md §5.3)",
    )
    # multi-host launch (one process per host, same command on every host;
    # the reference's counterpart is the SGE/Accelerate DDP launch,
    # train.qsub.sh:15-17).  All three default to auto-detection on TPU
    # pods; on other clusters pass them explicitly.
    ap.add_argument("--coordinator", default=None,
                    help="host:port of rank 0 (multi-host only)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument(
        "--init-npz", default=None,
        help="warm-start params/EMA from a slim npz snapshot "
        "(utils/params_io.py); optimizer state starts fresh",
    )
    ap.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default=None,
        help="compute-dtype override (the bf16-vs-f32 training A/B; "
             "config default otherwise)",
    )
    ap.add_argument(
        "--fsdp", action="store_true",
        help="ZeRO-3-shard params/opt/EMA over the data axis "
        "(parallel/fsdp.py); the reference's only mode is replicated DDP",
    )
    args = ap.parse_args()

    from localdiffusion_tpu.parallel.multihost import (
        init_distributed, is_primary, sync,
    )

    # must run before any device access
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    cfg = load_config(args.config)
    if args.batch_size is None:
        args.batch_size = cfg.train.batch_size
    if args.results or args.dtype:
        import dataclasses

        over = {}
        if args.results:
            over["results_dir"] = args.results
        if args.dtype:
            over["compute_dtype"] = args.dtype
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **over))

    from localdiffusion_tpu.data import ArrayLoader
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.train.trainer import Trainer

    np.random.seed(42)
    key = jax.random.PRNGKey(42)

    import jax.numpy as _jnp

    dtype = getattr(_jnp, cfg.train.compute_dtype)
    gd = GaussianDiffusion(cfg.model, cfg.diffusion, dtype=dtype)
    mesh = None
    if jax.process_count() > 1 or (args.fsdp and len(jax.devices()) > 1):
        from localdiffusion_tpu.parallel.mesh import make_mesh

        from localdiffusion_tpu.parallel.multihost import warmup_collectives

        mesh = make_mesh(data=len(jax.devices()), patch=1)
        warmup_collectives(mesh)
        print(
            f"multi-host: {jax.process_count()} processes / "
            f"{len(jax.devices())} devices, mesh data={len(jax.devices())}"
        )
    trainer = Trainer(gd, cfg.train, mesh=mesh, fsdp=args.fsdp and mesh is not None)
    state = trainer.init_state(key)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"Total number of parameters: {n_params}")

    start_step = 0
    if args.init_npz:
        # warm start: params (and the EMA copy) from a slim npz snapshot
        # (utils/params_io.py); optimizer state and step start fresh
        import jax.numpy as jnp

        from localdiffusion_tpu.utils.params_io import load_params_npz

        loaded = load_params_npz(args.init_npz, state.params)
        if trainer.mesh is None:
            state = state.replace(
                params=loaded,
                ema_params=jax.tree_util.tree_map(jnp.copy, loaded),
            )
        else:
            # rebuild the whole state on host (a live FSDP state can't be
            # device_get across processes) and re-place it sharded
            from localdiffusion_tpu.parallel.fsdp import put_tree_sharded
            from localdiffusion_tpu.train.trainer import TrainState

            opt_host = jax.device_get(trainer.optimizer.init(loaded))
            host_state = TrainState(
                step=np.zeros((), np.int32),
                params=loaded,
                opt_state=opt_host,
                ema_params=jax.tree_util.tree_map(np.copy, loaded),
            )
            state = put_tree_sharded(
                host_state,
                trainer._state_sharding(broadcast=not trainer.fsdp),
            )
        print(f"warm-started params from {args.init_npz}")
    if args.resume == "auto" and os.path.exists(
        os.path.join(trainer.results_dir, "model-latest")
    ):
        try:
            state = trainer.load("latest")
            start_step = int(state.step)
            print(f"auto-resumed from model-latest at step {start_step}")
        except Exception as e:
            print(f"resume failed ({e}); starting fresh")

    (hr_tr, lr_tr), (hr_te, lr_te) = build_dataset(cfg)
    if mesh is not None:
        # batch-sharded feeding needs len % mesh data width == 0; drop the
        # tail deterministically (DataLoader drop_last equivalent)
        d = int(mesh.shape["data"])
        n_keep = (len(hr_tr) // d) * d
        if n_keep != len(hr_tr):
            print(f"trimming train set {len(hr_tr)} -> {n_keep} "
                  f"(divisible by data={d})")
            hr_tr, lr_tr = hr_tr[:n_keep], lr_tr[:n_keep]
    print(f"train {len(hr_tr)} / test {len(hr_te)} samples")
    dl = ArrayLoader(hr_tr, lr_tr, batch_size=args.batch_size, seed=42)

    steps = args.steps if args.steps is not None else cfg.train.num_steps
    save_every = args.eval_every or max(1, steps // 4)
    # survives watchdog relaunches: a fresh process must not demote the best
    # checkpoint saved before a wedge (best_eval.json in results_dir)
    from localdiffusion_tpu.train.trainer import load_best_eval, record_best_eval

    best = load_best_eval(trainer.results_dir) if args.resume == "auto" else float("inf")
    if best < float("inf"):
        print(f"best-eval tracker resumed at {best:.5f}")
    rng = jax.random.PRNGKey(cfg.train.seed)
    t0 = time.time()

    # append-only loss CSV (reference rewrites train_loss.csv per run,
    # ddpm.py:1563-1565, losing history on restart; CsvLogger appends so an
    # auto-resume keeps the prior curve)
    from localdiffusion_tpu.utils.logging import CsvLogger, Timer

    os.makedirs(trainer.results_dir, exist_ok=True)
    csv_path = os.path.join(trainer.results_dir, "train_loss.csv")
    # checkpoint/log writes are rank-0-only under multi-host (shared FS)
    if is_primary() and start_step == 0 and os.path.exists(csv_path):
        os.replace(csv_path, csv_path + ".prev")  # fresh run: rotate old log
    logger = CsvLogger(csv_path, ["step", "loss", "time_s"]) if is_primary() else None
    timer = Timer()

    def save_ckpt(st, milestone):
        # every rank calls save (FSDP gather inside is collective); the
        # actual write is rank-0-gated inside Trainer.save
        trainer.save(st, milestone)
        sync("ckpt")

    if args.step_mode == "resident":
        import jax.numpy as jnp

        data_hr, data_lr = trainer.put_batch(hr_tr, lr_tr)
        epoch_fn = trainer.epoch_resident_fn(len(hr_tr), args.batch_size)

    for step in range(start_step, steps):
        # per-step key via fold_in: O(1) resume realignment (a split-chain
        # would replay start_step device calls)
        sub = jax.random.fold_in(rng, step)
        with timer.time("train_step"):
            if args.step_mode == "resident":
                state, loss = epoch_fn(state, data_hr, data_lr, sub)
                loss = float(loss)
            elif args.step_mode == "epoch":
                state, loss = trainer.train_epoch_step(
                    state, dl.epoch_batches(step), sub
                )
            else:
                hr_b, lr_b = next(iter(dl.epoch_batches(step)))
                state, loss = trainer.train_batch_step(state, hr_b, lr_b, sub)
        if logger:
            logger.log(step=step, loss=loss, time_s=f"{time.time() - t0:.2f}")
        if step % 10 == 0 or step == steps - 1:
            print(f"step {step}: loss {loss:.5f} ({time.time() - t0:.1f}s)")
        if (step + 1) % save_every == 0 or step == steps - 1:
            from localdiffusion_tpu.config import min_max_val_for

            ek = jax.random.PRNGKey(0)
            with timer.time("eval_sample"):
                m = trainer.eval_sample_mse(
                    state, hr_te[:8], lr_te[:8], ek,
                    min_max_val=min_max_val_for(cfg),
                )
            print(f"  eval sample MSE: {m:.5f}")
            if m < best:
                best = m
                from localdiffusion_tpu.train.trainer import round_milestone

                save_ckpt(state, "best" + round_milestone(step + 1))
                if is_primary():
                    record_best_eval(
                        trainer.results_dir, m, "best" + round_milestone(step + 1)
                    )
                print(f"  saved best{round_milestone(step + 1)}")
            with timer.time("checkpoint"):
                save_ckpt(state, "latest")  # preemption-recovery point
    save_ckpt(state, "latest")
    if logger:
        logger.close()
    phase_means = {k: f"{v * 1e3:.1f}ms" for k, v in timer.summary().items()}
    print(f"phase means: {phase_means}")
    print("done")


if __name__ == "__main__":
    main()
