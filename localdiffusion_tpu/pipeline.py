"""End-to-end local-diffusion inference pipeline.

Equivalent of the reference inference script flow (reference test.py:180-445):
for each (hr, lr) pair — Stage A: OOD-detect the conditioning image into a
soft mask; Stage B: branched local-diffusion sampling with mid-chain fusion;
then metrics and artifact collection.

Differences by design: the sampler is a compiled scan (compiled once, reused
across images), masks stay device-resident, and per-image wall-clock capture
uses the same boundary the reference times (test.py:392-415).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from localdiffusion_tpu.config import Config, min_max_val_for
from localdiffusion_tpu.diffusion import sampler as S
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.ood.frontend import OODFrontend
from localdiffusion_tpu.utils.metrics import mse, psnr, ssim


class LocalDiffusionPipeline:
    """Config-driven translate-with-hallucination-suppression pipeline."""

    def __init__(
        self,
        config: Config,
        gd: GaussianDiffusion,
        params,
        frontend: Optional[OODFrontend] = None,
        classifier_gate=None,
        mesh=None,
    ):
        self.config = config
        self.gd = gd
        self.params = params
        self.frontend = frontend
        self.classifier_gate = classifier_gate
        self.min_max_val = min_max_val_for(config)
        self.mesh = mesh
        if mesh is not None:
            # multi-chip serving: params replicated once up front; batches
            # are sharded over 'data' (and the IND/OOD pair over 'patch')
            # per translate() call
            from localdiffusion_tpu.parallel.mesh import replicated

            self.params = jax.device_put(self.params, replicated(mesh))
        self._branched_fn = None
        self._plain_fn = None

    def _branch_sharding(self):
        """[2B, ...] flat branch-pair sharding: pair over 'patch', batch
        over 'data' (same spec tests/test_patch_parallel.py validates)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(("patch", "data")))

    # ------------------------------------------------------------------
    def _compile_branched(self):
        scfg = self.config.sampler
        mmv = self.min_max_val
        gd = self.gd
        gate = self.classifier_gate if scfg.classifier else None
        use_gt = scfg.use_gt and scfg.start_intermediate
        bs = self._branch_sharding()
        if gd.is_ddim_sampling:
            def fn(params, cond, mask, key, gt=None):
                return S.ddim_sample_branched(
                    gd, params, cond, mask, key, scfg, mmv,
                    branch_sharding=bs,
                )
        else:
            def fn(params, cond, mask, key, gt=None):
                return S.ddpm_sample_branched(
                    gd, params, cond, mask, key, scfg, mmv,
                    gt=gt if use_gt else None, classifier_fn=gate,
                    return_fusion_time=gate is not None,
                    branch_sharding=bs,
                )
        return jax.jit(fn)

    def _compile_plain(self):
        mmv = self.min_max_val
        gd = self.gd
        if gd.is_ddim_sampling:
            def fn(params, cond, key):
                return S.ddim_sample_plain(gd, params, cond, key, mmv)
        else:
            def fn(params, cond, key):
                return S.ddpm_sample_plain(gd, params, cond, key, mmv)
        return jax.jit(fn)

    # ------------------------------------------------------------------
    def translate(
        self,
        lr: np.ndarray,
        hr: Optional[np.ndarray] = None,
        key=None,
        mask: Optional[np.ndarray] = None,
        gt_region: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """One batch through Stage A + Stage B.

        `mask` overrides the detector (the reference's manual-mask path);
        otherwise the frontend computes it (or uniform ones without one).
        `gt_region` (binary ground-truth OOD mask, e.g. the seg label) adds
        the region-restricted MSE metric without influencing sampling.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        scfg = self.config.sampler
        lr_j = jnp.asarray(lr, jnp.float32)
        if self.mesh is not None:
            from localdiffusion_tpu.parallel.mesh import batch_sharding

            if lr_j.shape[0] % int(self.mesh.shape["data"]) != 0:
                raise ValueError(
                    f"batch {lr_j.shape[0]} not divisible by mesh data width "
                    f"{self.mesh.shape['data']}"
                )
            lr_j = jax.device_put(lr_j, batch_sharding(self.mesh))

        amap = None
        if mask is None:
            if self.frontend is not None and scfg.ood_ad:
                mask, binary, amap = self.frontend.detect(np.asarray(lr))
            else:
                mask = np.ones(
                    (lr.shape[0], self.gd.image_size, self.gd.image_size, 1),
                    np.float32,
                )

        # uniform-ones mask → plain chain (reference ddpm.py:1110-1117)
        uniform = bool(np.all(mask == 1.0))
        branch = scfg.branch_out and not uniform

        gt_j = (
            jnp.asarray(hr, jnp.float32)
            if (hr is not None and scfg.use_gt and scfg.start_intermediate)
            else None
        )
        t0 = time.perf_counter()
        fusion_time = None
        if branch:
            if self._branched_fn is None:
                self._branched_fn = self._compile_branched()
            mask_j = jnp.asarray(mask)
            if self.mesh is not None:
                from localdiffusion_tpu.parallel.mesh import batch_sharding

                mask_j = jax.device_put(mask_j, batch_sharding(self.mesh))
            out = self._branched_fn(self.params, lr_j, mask_j, key, gt_j)
            if (
                self.classifier_gate is not None
                and scfg.classifier
                and not self.gd.is_ddim_sampling
            ):
                out, fusion_time = out
        else:
            if self._plain_fn is None:
                self._plain_fn = self._compile_plain()
            out = self._plain_fn(self.params, lr_j, key)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0

        result: Dict[str, np.ndarray] = {
            "pred": np.asarray(out),
            "mask": np.asarray(mask),
            "time": np.asarray(dt),
            "branched": np.asarray(branch),
        }
        if fusion_time is not None:
            # per-sample classifier-acceptance timestep (the reference's
            # fusion_time.npy diagnostic, ddpm.py:902-903)
            result["fusion_time"] = np.asarray(fusion_time)
        if amap is not None:
            result["anomaly_map"] = amap
        if hr is not None:
            hr_j = jnp.asarray(hr, jnp.float32)
            result["mse"] = np.asarray(mse(out, hr_j))
            result["ssim"] = np.asarray(ssim(out, hr_j, data_range=float(self.min_max_val[1])))
            result["psnr"] = np.asarray(psnr(out, hr_j, data_range=float(self.min_max_val[1])))
            if gt_region is not None:
                # MSE restricted to the ground-truth OOD region: the metric
                # that exposes hallucination — whole-image MSE is dominated
                # by the (much larger) in-distribution area
                m = np.asarray(gt_region, np.float32)
                m = (m > 0).astype(np.float32)
                denom = max(float(m.sum()), 1.0)
                err = (np.asarray(out, np.float32) - np.asarray(hr_j, np.float32)) ** 2
                result["mse_ood_region"] = np.asarray(float((err * m).sum() / denom))
        return result

    # ------------------------------------------------------------------
    def run(
        self, pairs, key=None, save_prefix: Optional[str] = None, verbose: bool = True,
        gt_masks=None,
    ) -> Dict[str, np.ndarray]:
        """Full evaluation loop over (hr, lr) pairs (reference test.py:180-445).

        Collects hr/lr/pred/mask stacks, mean MSE and mean per-image sampling
        time; optionally dumps {prefix}hr_all.npy etc. like the reference
        (test.py:429-442).  `gt_masks` (aligned with pairs) adds the
        OOD-region-restricted MSE.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        hrs, lrs, preds, masks, losses, times = [], [], [], [], [], []
        region_losses = []
        fusion_times = []
        for i, (hr, lr) in enumerate(pairs):
            key, sub = jax.random.split(key)
            gt_m = gt_masks[i] if gt_masks is not None else None
            r = self.translate(lr, hr=hr, key=sub, gt_region=gt_m)
            if "mse_ood_region" in r:
                region_losses.append(float(r["mse_ood_region"]))
            hrs.append(hr)
            lrs.append(lr)
            preds.append(r["pred"])
            masks.append(r["mask"])
            losses.append(float(r["mse"]))
            times.append(float(r["time"]))
            # default = num_timesteps, like the reference's classifier_t
            # init (ddpm.py:1083)
            fusion_times.append(
                r.get(
                    "fusion_time",
                    np.full((lr.shape[0],), self.gd.num_timesteps, np.int32),
                )
            )
            if verbose:
                extra = (
                    f" mse_ood={region_losses[-1]:.5f}"
                    if "mse_ood_region" in r else ""
                )
                print(
                    f"[{i}] mse={losses[-1]:.5f} ssim={float(r['ssim']):.4f}"
                    f"{extra} time={times[-1]:.3f}s branched={bool(r['branched'])}"
                )
        out = {
            "hr_all": np.concatenate(hrs),
            "lr_all": np.concatenate(lrs),
            "pred_all": np.concatenate(preds),
            "ad_masks": np.concatenate(masks),
            "fusion_time": np.concatenate(fusion_times),
            "mean_mse": np.asarray(np.mean(losses)),
            "mean_time": np.asarray(np.mean(times[1:]) if len(times) > 1 else times[0]),
        }
        if region_losses:
            out["mean_mse_ood_region"] = np.asarray(np.mean(region_losses))
        if save_prefix is not None:
            for name in ("hr_all", "lr_all", "pred_all", "ad_masks", "fusion_time"):
                np.save(f"{save_prefix}{name}.npy", out[name])
        if verbose:
            print(f"Test loss: {float(out['mean_mse']):.4f}")
            if "mean_mse_ood_region" in out:
                print(f"OOD-region loss: {float(out['mean_mse_ood_region']):.4f}")
            print(f"Average sampling time: {float(out['mean_time']):.4f}")
        return out

    def translate_volume(
        self,
        dataset,
        batch_size: int = 8,
        key=None,
        verbose: bool = True,
    ) -> Dict[str, np.ndarray]:
        """Translate every slice of a per-volume dataset (items = (hr, lr[,
        seg])) in fixed-shape batches; returns stacked volumes + metrics.

        The reference's per-volume path is SingleMedDataset + its batch-1
        test loop (reference data.py:549-604, test.py:108); here slices run
        `batch_size` at a time through the SAME compiled chain (the last
        batch pads by repetition and the pad rows are dropped, so every
        batch reuses one static-shape program).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        n = len(dataset)
        items = [dataset[i] for i in range(n)]
        has_seg = len(items[0]) > 2
        hr = np.stack([it[0] for it in items])
        lr = np.stack([it[1] for it in items])
        seg = np.stack([it[2] for it in items]) if has_seg else None

        preds, masks, branched = [], [], []
        for i in range(0, n, batch_size):
            sel = np.arange(i, min(i + batch_size, n))
            pad = batch_size - len(sel)
            idx = np.concatenate([sel, np.repeat(sel[-1:], pad)]) if pad else sel
            key, sub = jax.random.split(key)
            r = self.translate(lr[idx], hr=hr[idx], key=sub)
            keep = slice(0, len(sel))
            preds.append(np.asarray(r["pred"])[keep])
            masks.append(np.asarray(r["mask"])[keep])
            branched.append(bool(r["branched"]))
            if verbose:
                print(f"slices {i}-{i + len(sel) - 1}: mse={float(r['mse']):.5f} "
                      f"branched={bool(r['branched'])}")
        pred = np.concatenate(preds)
        out = {
            "pred_volume": pred,
            "mask_volume": np.concatenate(masks),
            "hr_volume": hr,
            "lr_volume": lr,
            "mse": np.asarray(np.mean((pred - hr) ** 2)),
            "branched_batches": int(np.sum(branched)),
        }
        # region metric from the DE-PADDED volume (computing it inside
        # translate would count padded duplicate rows); same formula as
        # translate's mse_ood_region
        if seg is not None and np.any(seg > 0):
            m = (seg > 0).astype(np.float32)
            denom = max(float(m.sum()), 1.0)
            err = (pred.astype(np.float32) - hr.astype(np.float32)) ** 2
            out["mean_mse_ood_region"] = np.asarray(float((err * m).sum() / denom))
        if verbose:
            print(f"volume MSE: {float(out['mse']):.5f} "
                  f"({n} slices, {out['branched_batches']} branched batches)")
        return out
