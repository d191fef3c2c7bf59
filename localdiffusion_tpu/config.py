"""Immutable, validated configuration.

The reference drives everything off one flat, schema-less YAML dict that is
*mutated at runtime* as sampler control state (reference ddpm.py:1023,
ddpm.py:780-781).  Here the configuration is a frozen dataclass tree:

  * hyperparameters are immutable and hashable (usable as static jit args),
  * the sampler state machine is promoted OUT of config into explicit
    scan-carried state (see diffusion/sampler.py),
  * `load_reference_yaml` ingests the reference's flat config.yaml /
    config_train.yaml key set (reference config.yaml:1-66) so a user of the
    reference can bring their configs unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple

import yaml


def _frozen(**kw):
    return dataclass(frozen=True, **kw)


@dataclass(frozen=True)
class ModelConfig:
    """Denoiser UNet + condition-encoder hyperparameters.

    Mirrors the surface of reference ddpm.py:286-451 (Unet) and
    unet_model.py:91-137 (ResUnet condition encoder).
    """

    dim: int = 32
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    cond_channels: Optional[int] = None  # defaults to `channels`
    resnet_block_groups: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32
    full_attn: Tuple[bool, ...] = (False, False, False, True)
    # condition-encoder depth: 'shallow' early-exits after 3 blocks (the
    # reference's mnist/mvtecSR path, unet_model.py:131-132); 'deep' runs the
    # 4th block (mri/mvtec path, unet_model.py:116-118, 133-135).
    cond_encoder_depth: str = "auto"
    cond_group_num: int = 16
    time_emb_theta: int = 10000
    # self-conditioning: feed the previous x₀ estimate as extra input
    # channels (reference denoiser signature ddpm.py:404-408; off in every
    # shipped reference config)
    self_condition: bool = False
    # random/learned Fourier time features instead of the fixed sinusoidal
    # embedding (reference RandomOrLearnedSinusoidalPosEmb, ddpm.py:151-166,
    # wired at ddpm.py:331-343; off in every shipped reference config)
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    # TPU-first high-res variant (NOT in the reference — needs retraining):
    # f×f space-to-depth before the init conv and depth-to-space after the
    # final conv.  At 256px the faithful architecture keeps C=32 tensors at
    # full resolution, which drives XLA into transposing conv-layout copies
    # and ≤25% lane occupancy on the VPU/MXU (profiled: 25% of device time
    # in copies); the s2d stem trades them for C=128 at half resolution.
    # 1 = off (the reference architecture).
    stem_space_to_depth: int = 1
    # EXACT space-to-depth layout execution of the faithful architecture
    # (models/unet_s2d.py): same params, same outputs (float reassociation
    # only), but the full-resolution stage computes in an [H/f, W/f, f²·C]
    # layout with algebraically transformed kernels — no retraining, removes
    # the 256px conv-layout copies (measured 2.26 → 3.71 img/s at 256px).
    # 0 = auto (on for inputs ≥ 128px, off below — decided per call from the
    # input shape, so patch-parallel tiles resolve independently);
    # 1 = off; 2 = fold 2×2 blocks.
    exact_layout_s2d: int = 0
    # How many leading UNet resolution levels run in the exact s2d layout.
    # 1 = only the full-res stage.  2 also folds the next stage (e.g.
    # C=32@128² of the 4-stage 256px arch — in_out[1]); boundaries cross via
    # cheap half/quarter-res s2d copies.  0 = auto, which resolves to 1:
    # folding deeper levels was measured SLOWER on-chip (see
    # resolve_s2d_stages).  Explicit values cap at num_stages-1.
    exact_layout_s2d_stages: int = 0

    def __post_init__(self):
        if len(self.full_attn) != len(self.dim_mults):
            raise ValueError(
                f"full_attn {self.full_attn} must match dim_mults {self.dim_mults}"
            )
        if self.cond_encoder_depth not in ("shallow", "deep", "auto"):
            raise ValueError(f"bad cond_encoder_depth {self.cond_encoder_depth}")
        if self.exact_layout_s2d > 1 and self.stem_space_to_depth > 1:
            raise ValueError(
                "exact_layout_s2d transforms the faithful architecture; "
                "it cannot combine with the stem_space_to_depth variant"
            )
        if self.exact_layout_s2d < 0:
            raise ValueError("exact_layout_s2d: 0=auto, 1=off, >=2=fold factor")
        if self.exact_layout_s2d_stages < 0:
            raise ValueError("exact_layout_s2d_stages: 0=auto, >=1 explicit")

    def resolve_s2d_stages(self) -> int:
        """Number of leading resolution levels the exact s2d execution folds.

        auto (0) = 1: only the full-resolution stage.  Folding level 1 too
        was MEASURED SLOWER on the 256px 4-stage arch (3.55 vs 3.82 img/s
        on-chip, round 3): at C=32@128² the conv already runs ~5 TF/s and
        the folded C=128@64² conv's ~22 TF/s does not recover the f²× FLOPs
        (cost ratio 4/22 vs 1/5 ≈ 0.95 break-even on convs, and the
        boundary copies/transition overhead tip it negative) — unlike level
        0, where C=32@256² runs at 3.7 TF/s against 21.7 (scripts/
        bench_convgeo.py).  Explicit values >1 remain available, capped at
        num_stages-1."""
        cap = max(1, len(self.dim_mults) - 1)
        s = self.exact_layout_s2d_stages
        return min(s, cap) if s > 0 else 1

    def resolve_exact_layout_s2d(self, h: int, w: int) -> int:
        """Effective s2d layout factor for an input of spatial size (h, w).

        auto (0) turns the transform on for large inputs where the C≈32
        full-res stage is layout-bound (≥128px), off for small ones where
        the fold overhead outweighs the gain (e.g. 28px MNIST)."""
        f = self.exact_layout_s2d
        if f == 1:
            return 1
        if f == 0:
            f = 2
            if min(h, w) < 128:
                return 1
        if (
            self.stem_space_to_depth > 1
            or len(self.dim_mults) < 2
            or h % (self.downsample_factor * f)
            or w % (self.downsample_factor * f)
        ):
            return 1
        return f

    @property
    def resolved_init_dim(self) -> int:
        return self.init_dim if self.init_dim is not None else self.dim

    @property
    def resolved_out_dim(self) -> int:
        return self.out_dim if self.out_dim is not None else self.channels

    @property
    def resolved_cond_channels(self) -> int:
        return self.cond_channels if self.cond_channels is not None else self.channels

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def cond_num_blocks(self) -> int:
        """Condition-encoder depth: must align its spatial reduction with the
        denoiser bottleneck (reference shallow=3 / deep=4 blocks).  The s2d
        stem halves the denoiser bottleneck per factor-of-2, so the encoder
        goes correspondingly deeper."""
        extra = max(0, (self.stem_space_to_depth - 1).bit_length())
        if self.cond_encoder_depth == "shallow":
            return 3 + extra
        if self.cond_encoder_depth == "deep":
            return 4 + extra
        return len(self.dim_mults) + extra

    @property
    def cond_base_dim(self) -> int:
        """32 matches the reference filter stack [32,32,64,128,256]; scaled
        with `dim` when the denoiser is resized."""
        return 32 if self.dim >= 32 else self.dim


@dataclass(frozen=True)
class DiffusionConfig:
    """Gaussian diffusion process hyperparameters (reference ddpm.py:496-620)."""

    image_size: int = 28
    timesteps: int = 250
    sampling_timesteps: Optional[int] = None  # < timesteps → DDIM
    objective: str = "pred_x0"  # pred_noise | pred_x0 | pred_v
    beta_schedule: str = "sigmoid"  # linear | cosine | sigmoid
    ddim_sampling_eta: float = 0.0
    auto_normalize: bool = False
    offset_noise_strength: float = 0.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0

    def __post_init__(self):
        if self.objective not in ("pred_noise", "pred_x0", "pred_v"):
            raise ValueError(f"unknown objective {self.objective}")
        if self.beta_schedule not in ("linear", "cosine", "sigmoid"):
            raise ValueError(f"unknown beta schedule {self.beta_schedule}")
        if self.sampling_timesteps is not None and self.sampling_timesteps > self.timesteps:
            raise ValueError("sampling_timesteps must be <= timesteps")

    @property
    def resolved_sampling_timesteps(self) -> int:
        return (
            self.sampling_timesteps
            if self.sampling_timesteps is not None
            else self.timesteps
        )

    @property
    def is_ddim_sampling(self) -> bool:
        return self.resolved_sampling_timesteps < self.timesteps


@dataclass(frozen=True)
class SamplerConfig:
    """Local-diffusion sampling options.

    These are the *static* switches of the reference's sampler state machine
    (reference config.yaml:19-36, mutated at ddpm.py:779-781, 906-908,
    1110-1117).  Dynamic state (currently-branched, retry phase) lives in the
    scan carry, not here.
    """

    branch_out: bool = True
    start_intermediate: bool = True
    start_timestep: int = 2  # fusion point: fuse when t <= start_timestep
    use_gt: bool = False
    use_gt_timestep: int = 100
    # set (with mask_x) by sampler.reconcile() when ood_ad/ood_confidence
    # (reference ddpm.py:1106-1108); like the reference, no compute reads it
    # beyond that reconciliation — the reference only ever assigns it
    # (ddpm.py:1107, 1114) and prints it (ddpm.py:1119)
    mask_cond: bool = False
    mask_x: bool = True
    # OOD-branch output policy under mask_x (reference ddpm.py:697-708):
    #  'cond'   → replace OOD-branch output with the binary-masked cond image
    #             (the reference's mnist/mvtec/oct/imagenet path)
    #  'minval' → mask output to min_val outside the mask (the mri path)
    mask_x_policy: str = "cond"
    # how cond_in keeps "some information" about the OOD region
    # (reference ddpm.py:683-686): clip(1-mask, lo, 1.0)
    cond_in_floor: float = 0.5  # 0.5 for mnist, 0.95 otherwise
    classifier: bool = False
    # selects the classifier oracle's own memory bank
    # (reference models.py:278-287: patchcore_mnist_{obj}_hr.pth /
    # memory_bank_mvtec_{obj}.npy); consumed by scripts/test.py
    classifier_obj: str = "tile"
    # gate polarity.  'preserve' is the reference semantics (ddpm.py:888:
    # accept while the fused x_start still scores ANOMALOUS — the task
    # output is supposed to retain the anomaly).  'suppress' is the dual
    # for anomaly-REMOVING translations (e.g. tumor-free target
    # modalities): accept while the x_start scores NORMAL, reject + re-fuse
    # when lesion-like residue appears.  EXTENSION — the reference
    # hard-codes 'preserve'.
    classifier_polarity: str = "preserve"  # preserve | suppress
    ood_ad: bool = True
    # confidence-driven run: like ood_ad, forces mask_cond/mask_x on at
    # dispatch (reference ddpm.py:1106-1108, our sampler.reconcile)
    ood_confidence: bool = False
    return_all_timesteps: bool = False
    # parity flag: fuse noisy states with the reference's zero-sentinel
    # where(x_out == 0, x_in, x_out) (reference ddpm.py:797, 1035).  'mask'
    # routes by the binary mask instead (robust to genuinely-zero pixels).
    fusion_route: str = "zero_sentinel"  # zero_sentinel | mask
    # classifier-gated re-branching retry budget: after this many per-sample
    # rejections the gate force-accepts the plain chain.  0 = unbounded,
    # reproducing the reference exactly (it retries until accept or t == 0,
    # ddpm.py:883-916).
    max_classifier_retries: int = 0

    def __post_init__(self):
        if self.mask_x_policy not in ("cond", "minval"):
            raise ValueError(f"bad mask_x_policy {self.mask_x_policy}")
        if self.classifier_polarity not in ("preserve", "suppress"):
            raise ValueError(
                f"bad classifier_polarity {self.classifier_polarity}"
            )
        if self.fusion_route not in ("zero_sentinel", "mask"):
            raise ValueError(f"bad fusion_route {self.fusion_route}")


@dataclass(frozen=True)
class OODConfig:
    """OOD front-end (PatchCore / segmentation detector) options.

    Mirrors reference models.py:42-254 (PatchcoreModel), test.py:150-178
    (detector init) and config.yaml:38-41 (ood_detector block).
    """

    detector: str = "patchcore"  # patchcore | seg | manual | none
    backbone: str = "wide_resnet50_2"
    layers: Tuple[str, ...] = ("layer2", "layer3")
    # pluggable feature extractor (ood/features.py): the reference
    # hard-wires ImageNet-pretrained WRN50-2 (models.py:62-72), which has no
    # weights in this environment; in-env-trainable substitutes lift mask
    # IoU (docs/STATUS.md round-4).  wrn | seg_encoder | denoiser
    feature_source: str = "wrn"
    feature_layers: Tuple[str, ...] = ()  # () → per-source default
    feature_npz: Optional[str] = None  # denoiser params snapshot
    # denoiser tap timestep (small = near-clean pass); a tuple builds a
    # multi-t ensemble — taps at every listed t are concatenated into ONE
    # embedding/memory bank (VERDICT r4 next #1: multi-t feature ensembles)
    feature_t: Any = 5
    input_size: int = 224  # 84 for mnist (reference test.py:164-167)
    num_neighbors: int = 9
    coreset_ratio: float = 0.1
    memory_bank_path: Optional[str] = None
    # fitted threshold ladder (JSON from ood.thresholds.fit_ladder/
    # save_ladder) — self-calibrated from normal-set anomaly scores by
    # scripts/anomaly_model_train.py; preferred over the hand-tuned
    # reference ladders (test.py:251-375) when present, since those are
    # only valid for the reference's pretrained backbone
    ladder_path: Optional[str] = None
    backbone_weights_path: Optional[str] = None  # torch state-dict → flax
    seg_model_path: Optional[str] = None
    # fixed classifier threshold; None → ROC-calibrate from a labeled loader
    # (reference models.py:292-294, 338-402)
    classifier_threshold: Optional[float] = None
    # manual mask (the committed reference behavior, test.py:379-381):
    # left `manual_mask_cols` columns flagged OOD.
    manual_mask_cols: int = 7
    # EXTENSION (no reference equivalent — the reference masks are raw
    # thresholdings, test.py:260): grow detector masks by `mask_dilate`
    # pixels of grey dilation before branching.  Under-segmenting detectors
    # (e.g. mask-IoU 0.45 at 256px, docs/STATUS.md) leave a halo of OOD
    # pixels un-branched; dilation trades a little extra branched area for
    # recovering them.  0 = off (exact reference semantics); -1 = auto —
    # derived from detector stats instead of hand-tuned (VERDICT r2 item 5):
    # for patchcore, one feature cell of the COARSEST backbone layer used,
    # expressed in output pixels (the anomaly map cannot localize a boundary
    # finer than its feature stride, so the halo of missed OOD pixels is at
    # most ~one cell wide — stride 16 at input 224 → 16·256/224 ≈ 18px at
    # 256px, matching the hand-found 16); for seg (full-res masks) and
    # manual/none, auto resolves to 0.
    mask_dilate: int = 0
    # EXTENSION (VERDICT r4 next #1 — raw mask quality): refine the binary
    # mask before the residual mask_dilate.  'hysteresis' re-seeds each
    # anomalous image at a PER-IMAGE level and grows the seeds through
    # connected pixels above a lower level (ood/thresholds.py refine_mask):
    # the ladder still makes the anomalous-or-not gate decision, but the
    # segmentation follows each image's own score distribution instead of a
    # global constant + isotropic dilation.  'none' = ladder masks only.
    mask_refine: str = "none"  # none | hysteresis
    # seed level: 'ladder' keeps the fitted-ladder threshold pixels as
    # seeds; 'fwhm' re-thresholds at bg + refine_hi_frac·(max − bg) of each
    # image's own map (full-width-at-fraction-of-max segmentation)
    refine_seed: str = "fwhm"  # ladder | fwhm
    refine_hi_frac: float = 0.5
    # growth floor: pixels above bg + refine_lo_frac·(max − bg) that are
    # CONNECTED to a seed join the mask (hysteresis, à la Canny)
    refine_lo_frac: float = 0.25
    # drop grown components smaller than this many pixels (0 = keep all);
    # components not connected to any seed are always dropped
    refine_min_area: int = 0

    # feature stride of each supported WRN50-2 tap (ood/wide_resnet.py)
    _LAYER_STRIDE = {"layer1": 4, "layer2": 8, "layer3": 16, "layer4": 32}

    def _stride_of(self, layer: str) -> int:
        """Feature stride of a tap, for any feature source (ood/features.py):
        WRN layerN, seg-encoder inc/downN, denoiser downN_blockM.

        Config-only fallback — it cannot know the denoiser's
        stem_space_to_depth factor; callers that have the instantiated
        source should pass its .strides dict to resolved_mask_dilate."""
        if layer in self._LAYER_STRIDE:
            return self._LAYER_STRIDE[layer]
        if layer == "inc":
            return 1
        if layer.startswith("down") and layer[4:5].isdigit():
            return 2 ** int(layer[4])
        return 8

    def resolved_mask_dilate(self, image_size: int, strides=None) -> int:
        """Dilation radius in output pixels; resolves the -1 auto sentinel.

        `strides`: the instantiated feature source's per-tap stride dict
        (ood/features.py `.strides` — includes the denoiser stem factor
        the config alone cannot see; ADVICE r4).  The input_size rescale
        applies only to the 'imagenet'-preprocessed WRN path — raw-
        preprocess sources (seg_encoder, denoiser) see the conditioning
        image at native resolution, so their tap stride IS output pixels."""
        if self.mask_dilate >= 0:
            return self.mask_dilate
        if self.detector != "patchcore":
            return 0
        # fallback layer tuples match make_feature_source's per-source
        # defaults (ood/features.py)
        layers = self.feature_layers or {
            "wrn": self.layers,
            "seg_encoder": ("down2", "down3"),
            "denoiser": ("down2_block2", "down3_block2"),
        }[self.feature_source]
        if strides:
            stride = max(strides.get(l, self._stride_of(l)) for l in layers)
        else:
            stride = max(self._stride_of(l) for l in layers)
        if self.feature_source == "wrn":
            return max(1, round(stride * image_size / self.input_size))
        return max(1, int(stride))

    def __post_init__(self):
        if self.detector not in ("patchcore", "seg", "manual", "none"):
            raise ValueError(f"unknown ood detector {self.detector}")
        if self.feature_source not in ("wrn", "seg_encoder", "denoiser"):
            raise ValueError(f"unknown feature_source {self.feature_source}")
        if self.mask_dilate < -1:
            raise ValueError("mask_dilate must be >= 0, or -1 for auto")
        if self.mask_refine not in ("none", "hysteresis"):
            raise ValueError(f"unknown mask_refine {self.mask_refine}")
        if self.refine_seed not in ("ladder", "fwhm"):
            raise ValueError(f"unknown refine_seed {self.refine_seed}")
        if not 0.0 < self.refine_lo_frac <= self.refine_hi_frac <= 1.0:
            raise ValueError(
                "need 0 < refine_lo_frac <= refine_hi_frac <= 1"
            )


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection, paths and normalization statistics."""

    name: str = "mnist"  # mnist | mri | mvtec | mvtecSR | synthetic
    mnist_path: str = "./MNIST/raw/train-images-idx3-ubyte"
    mnist_labels_path: str = "./MNIST/raw/train-labels-idx1-ubyte"
    mri_files: str = ""
    mvtec_path: str = ""
    mnist_cls: str = "8to3"
    anomaly_name: Any = 3
    augmentations: bool = False
    translate_zero: bool = True
    mean_t1: float = 610.7180906353575
    std_t1: float = 1018.7631901605115
    mean_flair: float = 221.69656048399028
    std_flair: float = 386.31912016662903
    mean_t2: float = 426.0168
    std_t2: float = 771.2276
    mean_mnist: float = 33.31842
    std_mnist: float = 78.5679


@dataclass(frozen=True)
class TrainConfig:
    """Training-runtime options (reference Trainer, ddpm.py:1252-1607)."""

    batch_size: int = 64
    lr: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    num_steps: int = 100000
    ema_decay: float = 0.995
    ema_update_every: int = 10
    max_grad_norm: float = 1.0
    save_and_sample_every: int = 500
    results_dir: str = "./results"
    project_name: str = "mnist"
    # 'epoch' reproduces the reference's full-dataset gradient accumulation
    # (one optimizer step per epoch, ddpm.py:1543-1561); 'batch' is the
    # standard per-batch step.
    step_mode: str = "epoch"
    # compute dtype for the model ('bfloat16' on TPU, params stay f32)
    compute_dtype: str = "float32"
    seed: int = 42

    def __post_init__(self):
        if self.step_mode not in ("epoch", "batch"):
            raise ValueError(f"bad step_mode {self.step_mode}")


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit sharding.

    data  — batch-axis data parallelism (the reference's DDP equivalent,
            ddpm.py:1281-1284 via HF Accelerate/NCCL → XLA ICI collectives)
    patch — patch/branch-axis parallelism for branched & tiled sampling
            (the novel scale-out axis; BASELINE.json config 5)
    """

    data_axis: int = -1  # -1 → all remaining devices
    patch_axis: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    ood: OODConfig = field(default_factory=OODConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "Config":
        def build(cls, sub):
            names = {f.name for f in dataclasses.fields(cls)}
            kw = {k: v for k, v in dict(sub or {}).items() if k in names}
            for f in dataclasses.fields(cls):
                if f.name in kw and isinstance(kw[f.name], list):
                    kw[f.name] = tuple(kw[f.name])
            return cls(**kw)

        return Config(
            model=build(ModelConfig, d.get("model")),
            diffusion=build(DiffusionConfig, d.get("diffusion")),
            sampler=build(SamplerConfig, d.get("sampler")),
            ood=build(OODConfig, d.get("ood")),
            data=build(DataConfig, d.get("data")),
            train=build(TrainConfig, d.get("train")),
            mesh=build(MeshConfig, d.get("mesh")),
        )

    @staticmethod
    def load_yaml(path: str) -> "Config":
        with open(path) as f:
            return Config.from_dict(yaml.safe_load(f))


# ---------------------------------------------------------------------------
# Reference-config compatibility layer
# ---------------------------------------------------------------------------

# Per-dataset model presets used by the reference entry scripts
# (test.py:114-129: mnist gets dim_mults=(1,2,4), full_attn=(F,F,T); mvtec
# gets 3 channels; mri gets the default 4-stage UNet).
_DATASET_MODEL_PRESETS = {
    "mnist": dict(
        dim_mults=(1, 2, 4),
        full_attn=(False, False, True),
        channels=1,
        cond_encoder_depth="shallow",
    ),
    "mri": dict(
        dim_mults=(1, 2, 4, 8),
        full_attn=(False, False, False, True),
        channels=1,
        cond_encoder_depth="deep",
    ),
    "mvtec": dict(
        dim_mults=(1, 2, 4, 8),
        full_attn=(False, False, False, True),
        channels=3,
        cond_encoder_depth="deep",
    ),
    "mvtecSR": dict(
        dim_mults=(1, 2, 4),
        full_attn=(False, False, True),
        channels=3,
        cond_encoder_depth="shallow",
    ),
}


def load_reference_yaml(path: str) -> Config:
    """Load a reference-format flat YAML (config.yaml / config_train.yaml).

    Maps the ~40 flat keys of the reference config (reference config.yaml)
    onto the structured Config, applying the same per-dataset presets the
    reference entry scripts hard-code (test.py:114-129, main.py:24-26).
    """
    with open(path) as f:
        raw = yaml.safe_load(f)
    return reference_dict_to_config(raw)


def reference_dict_to_config(raw: Mapping[str, Any]) -> Config:
    g = raw.get
    data_name = g("data", "mnist")
    preset = dict(_DATASET_MODEL_PRESETS.get(data_name, {}))

    model = ModelConfig(
        dim=g("dim", 32),
        init_dim=g("dim", 32),
        **preset,
    )

    ddim = g("ddim_timestep", None)
    if ddim in (False, 0):
        ddim = None
    timesteps = g("timestep", 250)
    if ddim is not None and ddim >= timesteps:
        ddim = None  # equal → ancestral sampling, same as reference ddpm.py:562

    diffusion = DiffusionConfig(
        image_size=g("img_size", 28),
        timesteps=timesteps,
        sampling_timesteps=ddim,
        objective=g("pred_objective", "pred_x0"),
        beta_schedule=g("scheduler", "sigmoid"),
        auto_normalize=False,
    )

    sampler = SamplerConfig(
        branch_out=g("branch_out", True),
        start_intermediate=g("start_intermediate", True),
        start_timestep=g("start_timestep", 2),
        use_gt=g("use_gt", False),
        use_gt_timestep=g("use_gt_timestep", 100),
        mask_cond=g("mask_cond", False),
        mask_x=g("mask_x", True),
        mask_x_policy="minval" if "mri" in str(data_name) else "cond",
        cond_in_floor=0.5 if data_name == "mnist" else 0.95,
        classifier=g("classifier", False),
        classifier_obj=g("classifier_obj", "tile"),
        classifier_polarity=g("classifier_polarity", "preserve"),
        ood_ad=g("ood_AD", True),
        ood_confidence=g("ood_confidence", False),
        return_all_timesteps=g("return_all_timesteps", False),
    )

    ood_block = g("ood_detector", {}) or {}
    ood = OODConfig(
        detector="seg" if ood_block.get("seg", False) else "patchcore",
        input_size=84 if data_name == "mnist" else 224,
        seg_model_path=ood_block.get("seg_model"),
    )

    data = DataConfig(
        name=data_name,
        mnist_path=g("mnist_path", "./MNIST/raw/train-images-idx3-ubyte"),
        mnist_labels_path=g("mnist_labels_path", "./MNIST/raw/train-labels-idx1-ubyte"),
        mri_files=g("mri_files", ""),
        mvtec_path=g("mvtec_path", ""),
        mnist_cls=g("mnist_cls", "8to3"),
        anomaly_name=g("anomaly_name", 3),
        augmentations=g("augmentations", False),
        translate_zero=g("translate_zero", True),
        mean_t1=g("mean_t1", 610.7180906353575),
        std_t1=g("std_t1", 1018.7631901605115),
        mean_flair=g("mean_flair", 221.69656048399028),
        std_flair=g("std_flair", 386.31912016662903),
        mean_t2=g("mean_t2", 426.0168),
        std_t2=g("std_t2", 771.2276),
        mean_mnist=g("mean_mnist", 33.31842),
        std_mnist=g("std_mnist", 78.5679),
    )

    train = TrainConfig(
        project_name=str(g("ProjectName", "project")).strip("/"),
        results_dir=g("Results", "./results"),
    )

    return Config(
        model=model,
        diffusion=diffusion,
        sampler=sampler,
        ood=ood,
        data=data,
        train=train,
    )


def min_max_val_for(config: Config) -> Tuple[float, float]:
    """Value range used to clip x_start during sampling.

    Mirrors reference test.py:17-37 (`set_min_max_val`): mnist/mvtec are
    [0, 2]; mri is z-scored [0, (4096-mean)/std (+|min|)] with the
    translate_zero shift.
    """
    name = config.data.name
    if name in ("mnist", "mvtec", "mvtecSR", "synthetic", "synthetic_texture"):
        return (0.0, 2.0)
    if name in ("mri", "synthetic_brain"):
        d = config.data
        if not d.translate_zero:
            max_val = (4096.0 - d.mean_flair) / d.std_flair
            min_val = (0.0 - d.mean_flair) / d.std_flair
            return (min_val, max_val)
        min_val2 = (0.0 - d.mean_flair) / d.std_flair
        max_val = (4096.0 - d.mean_flair) / d.std_flair + abs(min_val2)
        return (0.0, max_val)
    return (0.0, 2.0)
