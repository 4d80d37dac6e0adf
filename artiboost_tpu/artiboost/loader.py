"""ArtiBoostLoader — the online exploration-and-synthesis orchestrator.

Parity: ``anakin/artiboost/artiboost_loader.py`` (class ArtiBoostLoader)
with the TPU-native architecture:

  reference                          this framework
  ------------------------------     --------------------------------
  OVG torch DataLoader + GPU         one jitted pose-generator call
    pose-gen under no_grad             over the whole epoch's triplets
  /dev/shm pickle cache              GeneratedPoses arrays on device
  render worker processes + queues   fused synth_batch jit (rasterizer
                                       inside the input pipeline)
  MixedDataset index concat          per-batch static real/synth split
  dict-keyed per-triplet meters      dense (O, V, G) maps + scatter-add
  update_method_1..4 python loops    masked array ops (mining.py)

Public surface kept: ``prepare()``, ``step_eval(epoch, evaluator)``,
``__iter__``/``__len__``, ``synth_shutdown()``, plus ``state_dict()`` /
``load_state_dict()`` for checkpointing (weight + occurrence maps).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.ccv import (
    CCVSpace,
    build_blacklist_map,
    init_ccv_space,
    sample_triplets,
)
from artiboost_tpu.artiboost.grasp_library import GraspLibrary, get_grasp_library
from artiboost_tpu.artiboost.mining import UPDATE_METHODS
from artiboost_tpu.artiboost.object_library import ObjectLibrary, get_object_library
from artiboost_tpu.artiboost.pose_generator import GeneratedPoses, make_pose_generator
from artiboost_tpu.artiboost.refiner import build_refiner
from artiboost_tpu.artiboost.renderer import RenderAssets, default_render_assets
from artiboost_tpu.artiboost.scrambler import build_scrambler
from artiboost_tpu.artiboost.synth_batch import SynthConfig, make_synth_batch_fn
from artiboost_tpu.artiboost.view_engine import ViewEngineConfig, persp_rotmat_centers
from artiboost_tpu.mano.model import ManoModel, get_mano_model
from artiboost_tpu.metrics.val_metric import ValMetricAR2, ValMetricMean3DEPE2
from artiboost_tpu.utils.logger import logger


class ArtiBoostLoader:
    def __init__(
        self,
        real_dataset=None,                 # host dataset with sample_batch(idx)->dict
        cfg: Optional[Dict] = None,        # the MANAGER yaml node
        batch_size: int = 128,
        n_epochs: int = 100,
        mano_model: Optional[ManoModel] = None,
        seed: int = 0,
        mesh=None,                         # jax.sharding.Mesh: SPMD synthesis
    ):
        cfg = cfg or {}
        self.batch_size = batch_size
        self.mesh = mesh
        self.n_epochs = n_epochs
        self.key = jax.random.PRNGKey(seed)
        self.use_synth = True
        self.epoch_idx = 0

        obj_cfg = cfg.get("OBJ_ENGINE", {})
        obj_names = list(obj_cfg.get("OBJ", ["obj_a", "obj_b", "obj_c", "obj_d"]))
        dataset_type = obj_cfg.get("OBJ_ORIGIN_DATASET", "HO3D")
        grasp_cfg = cfg.get("GRASP_ENGINE", {})
        n_grasp = int(grasp_cfg.get("GRASP_NUM", 50))
        view_cfg_node = cfg.get("VIEW_ENGINE", {})
        z_range = view_cfg_node.get("CAMERA_Z_RANGE", [0.45, 0.55])
        self.view_cfg = ViewEngineConfig(
            persp_u_bins=int(view_cfg_node.get("PERSP_U_BINS", 12)),
            persp_theta_bins=int(view_cfg_node.get("PERSP_THETA_BINS", 24)),
            camera_z_min=float(z_range[0]), camera_z_max=float(z_range[1]),
        )

        self.mano_model = mano_model if mano_model is not None else get_mano_model()
        self.obj_lib: ObjectLibrary = get_object_library(obj_names, dataset_type)
        self.grasp_lib: GraspLibrary = get_grasp_library(obj_names, n_grasp)

        # CCV space (+ blacklist sweep, one vectorized shot)
        n_obj = len(obj_names)
        n_persp = self.view_cfg.n_persp
        blacklist = None
        if cfg.get("FILTER", {}).get("BACK", True):
            # disk cache keyed by engine identity (parity with the
            # reference's md5-cached sweep, artiboost_loader.py:428-449)
            import hashlib

            ident = hashlib.md5(repr((
                sorted(obj_names), dataset_type, n_grasp,
                self.view_cfg.persp_u_bins, self.view_cfg.persp_theta_bins,
                np.asarray(self.grasp_lib.hand_pose[..., :3]).tobytes(),
            )).encode()).hexdigest()
            cache_dir = cfg.get("CACHE_DIR", "common/cache/CCV_blacklist")
            cache_path = os.path.join(cache_dir, f"{ident}.npy")
            if os.path.isfile(cache_path):
                blacklist = jnp.asarray(np.load(cache_path))
            else:
                blacklist = build_blacklist_map(
                    self.mano_model, self.grasp_lib.hand_pose,
                    persp_rotmat_centers(self.view_cfg))
                os.makedirs(cache_dir, exist_ok=True)
                np.save(cache_path, np.asarray(blacklist))
            logger.info(
                f"blacklist: {float(jnp.mean(blacklist)) * 100:.1f}% of "
                f"{n_obj * n_persp * n_grasp} CCV triplets filtered")
        self.ccv = init_ccv_space(n_obj, n_persp, n_grasp, blacklist)

        # mining config
        self.update_method_key = cfg.get("UPDATE_METHOD", "method_1")
        wu = cfg.get("WEIGHT_UPDATE", {})
        self.weight_lower = float(wu.get("LOWER", 0.1))
        self.weight_upper = float(wu.get("UPPER", 10.0))
        dt = cfg.get("DIST_THRESHOLD", {})
        self.dist_lower = float(dt.get("LOWER", 8.0))
        self.dist_upper = float(dt.get("UPPER", 16.0))
        # method_3/4 "early shutdown" (the behavior the reference's
        # method_3 docstring describes, artiboost_loader.py:548-569):
        # when the fraction of seen triplets already solved to within
        # DIST_THRESHOLD.LOWER (dist_lower_ratio) crosses this, synthesis
        # shuts down and training continues real-only. 0 = never (default).
        self.synth_shutdown_ratio = float(cfg.get("SYNTH_SHUTDOWN_RATIO", 0.0))
        self.last_dist_lower_ratio = -1.0

        # generation pipeline
        scrambler = build_scrambler(cfg.get("SCRAMBLER", {"TYPE": "random",
                                                          "HAND_TSL_SIGMA": 0.01,
                                                          "HAND_POSE_SIGMA": 0.1}))
        refiner = build_refiner(cfg.get("REFINER", {"TYPE": "null"}), self.mano_model)
        self.pose_generator = make_pose_generator(
            self.mano_model, self.obj_lib, self.grasp_lib, self.view_cfg,
            scrambler, refiner)
        if mesh is not None:
            # SPMD pose sweep: triplet ids shard over the data axis so FK +
            # refinement run on every chip; the finished pose cache is
            # all-gathered to replicated (it is small: ~0.5KB/triplet) so
            # per-batch indexing during the epoch stays local
            from artiboost_tpu.parallel.mesh import batch_sharding, replicated_sharding

            data_sh, repl_sh = batch_sharding(mesh), replicated_sharding(mesh)
            self._generate_jit = jax.jit(
                self.pose_generator,
                in_shardings=(repl_sh, data_sh, data_sh, data_sh),
                out_shardings=repl_sh)
        else:
            self._generate_jit = jax.jit(self.pose_generator)

        # render pipeline
        rend_cfg = cfg.get("RENDERER", {})
        cam = rend_cfg.get("CAM_PARAM", {})
        data_preset = cfg.get("DATA_PRESET", {})
        image_size = data_preset.get("IMAGE_SIZE", [224, 224])[0]
        self.synth_cfg = SynthConfig(
            image_size=int(image_size),
            raw_size=int(rend_cfg.get("RENDER_SIZE", [512, 512])[0]),
            fx=float(cam.get("FX", 435.0)), fy=float(cam.get("FY", 435.0)),
            cx=float(cam.get("CX", 256.0)), cy=float(cam.get("CY", 256.0)),
            crop_model=data_preset.get("CROP_MODEL", "root_obj"),
            center_idx=int(data_preset.get("CENTER_IDX", 0)),
            bbox_expand_ratio=float(data_preset.get("BBOX_EXPAND_RATIO", 1.2)),
            cull_backfaces=bool(rend_cfg.get("CULL_BACKFACES", True)),
            lod_faces=int(rend_cfg.get("LOD_FACES", -1)),
            textured=bool(rend_cfg.get("TEXTURED", True)),
            bilinear=bool(rend_cfg.get("BILINEAR", False)),
            tex_subsample=int(rend_cfg.get("TEX_SUBSAMPLE", 2)),
            # bf16 post-render image passes: re-measured at the round-5
            # quad-rate regime where the HBM-bound blur/jitter chain is
            # ~half the synth cost — 21.4-22.9 -> 19.1-19.4 ms/batch
            # (-11-15%; was noise-level at the 62 ms regime). Storage
            # quantum ~0.002 on [-0.5, 0.5], under the 1/255 pixel step;
            # mixed batches promote back to f32 at the union concat.
            image_bf16=bool(rend_cfg.get("IMAGE_BF16", True)),
            tile_px=rend_cfg.get("TILE_PX"),
            sub_k=rend_cfg.get("SUB_K"),
            render_scale=rend_cfg.get("RENDER_SCALE"),  # None = auto (2)
            motion_blur=int(rend_cfg.get("MOTION_BLUR", 0)),
            motion_blur_prob=float(rend_cfg.get("MOTION_BLUR_PROB", 1.0)),
        )
        self.assets: RenderAssets = default_render_assets(
            self.mano_model,
            bgs_path=rend_cfg.get("BGS_PATH"),
            html_path=rend_cfg.get("HTML_PATH", "data/HTML_supp"))
        synth_fn = make_synth_batch_fn(self.mano_model, self.obj_lib, self.assets,
                                       self.synth_cfg)
        self.synth_batch_fn = synth_fn  # raw, for fusion into the train step
        if mesh is not None:
            # per-batch render shards over data: each chip rasterizes its
            # slice of the synth half-batch
            from artiboost_tpu.parallel.mesh import batch_sharding, replicated_sharding

            data_sh, repl_sh = batch_sharding(mesh), replicated_sharding(mesh)
            self._synth_batch_jit = jax.jit(
                synth_fn, in_shardings=(repl_sh, repl_sh, data_sh),
                out_shardings=data_sh)
        else:
            self._synth_batch_jit = jax.jit(synth_fn)

        # pose-sweep streaming chunk (parity: --opg_batch_size, default 256
        # in the reference; larger on TPU to amortize dispatch)
        self.opg_batch_size = int(cfg.get("OPG_BATCH_SIZE", 1024))

        # epoch sizing (parity: synth_len = synth_factor * len(real))
        self.real_dataset = real_dataset
        self.synth_factor = float(cfg.get("SYNTH_FACTOR", 0.6))
        real_len = len(real_dataset) if real_dataset is not None else 0
        self.config_len_train = int(cfg.get(
            "CONFIG_LEN_TRAIN", max(int(self.synth_factor * real_len), batch_size)))
        if mesh is not None:  # triplet count must tile the data axis
            n_data = int(mesh.shape["data"])
            self.config_len_train = -(-self.config_len_train // n_data) * n_data
        self.generated: Optional[GeneratedPoses] = None

        # val-mode sweep config (parity: ovg_set.py:104-132 + the VAL_LEN /
        # VAL_START_EPOCH / VAL_FREQ knobs in the released configs). The
        # dedicated val pass only runs when VAL_LEN is configured —
        # otherwise mining feeds from the training-epoch evaluator, which
        # is the reference's shipped behavior (its val gate is commented
        # out, artiboost_loader.py:293-295).
        self.has_val_sweep = "VAL_LEN" in cfg
        self.config_len_val = int(cfg.get("VAL_LEN", self.config_len_train))
        self.val_start_epoch = int(cfg.get("VAL_START_EPOCH", 0))
        self.val_freq = int(cfg.get("VAL_FREQ", 1))
        self.generated_val: Optional[GeneratedPoses] = None

    # ------------------------------------------------------------------
    # epoch lifecycle
    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def prepare(self):
        """Sample triplets + generate the epoch's pose cache (on device).

        The sweep streams through the jitted generator in fixed-size
        chunks (OPG_BATCH_SIZE, parity with the reference's OVG loader
        batches, opt_extra.py:8): a 40k-100k-triplet epoch in one jit
        would blow HBM inside the refiner's chamfer and recompile per
        epoch length; fixed chunks compile once and bound peak memory."""
        if not self.use_synth:
            return
        k_sample, k_gen = jax.random.split(self._next_key())
        oid, vid, gid, occ = sample_triplets(
            self.ccv, k_sample, self.config_len_train, replace=True)
        self.ccv = self.ccv._replace(occurrence_map=occ)
        self.generated = self._generate_poses(oid, vid, gid, k_gen)

    def _generate_poses(self, oid, vid, gid, k_gen) -> GeneratedPoses:
        """Chunked jitted pose sweep over sampled triplet ids."""
        n = int(oid.shape[0])
        chunk = min(self.opg_batch_size, n)
        if self.mesh is not None:  # chunk must tile the data axis
            n_data = int(self.mesh.shape["data"])
            chunk = max(-(-chunk // n_data) * n_data, n_data)
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:  # repeat-pad the tail so every chunk has one shape
            pad = n_pad - n
            oid, vid, gid = (jnp.concatenate([x, x[:pad]]) for x in (oid, vid, gid))

        sh = None
        if self.mesh is not None:
            # sample_triplets outputs commit to whatever sharding its inputs
            # had (replicated after a mining update); the sharded pose sweep
            # wants them split over the data axis
            from artiboost_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(self.mesh)
        pieces = []
        for s in range(0, n_pad, chunk):
            o, v, g = oid[s:s + chunk], vid[s:s + chunk], gid[s:s + chunk]
            if sh is not None:
                # put_global: multi-process-safe (every process computes
                # the identical triplet draw; each contributes its shard)
                from artiboost_tpu.parallel.mesh import put_global

                o, v, g = (put_global(x, sh) for x in (o, v, g))
            k_gen, sub = jax.random.split(k_gen)
            pieces.append(self._generate_jit(sub, o, v, g))
        multiproc = jax.process_count() > 1

        def tree_cat(*ps):
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *ps)

        def tree_trim(t):
            return jax.tree_util.tree_map(lambda x: x[:n], t)

        if len(pieces) == 1:
            gen = pieces[0]
        else:
            # multi-process: eager ops on global (non-fully-addressable)
            # arrays are illegal — route the concat through a jit
            gen = jax.jit(tree_cat)(*pieces) if multiproc else tree_cat(*pieces)
        if n_pad == n:
            return gen
        return jax.jit(tree_trim)(gen) if multiproc else tree_trim(gen)

    def prepare_val(self):
        """Val-mode CCV sweep (parity: ovg_set.py:104-132): a separate
        triplet draw with UNIFORM weights masked only by the blacklist,
        WITHOUT replacement (Gumbel top-k ~ torch.multinomial
        replacement=False), sized VAL_LEN — per-triplet val error is then
        measured on an unbiased sweep rather than the training draw."""
        if not self.use_synth:
            return
        O, V, G = self.ccv.shape
        n_valid = O * V * G - int(np.asarray(jnp.sum(self.ccv.blacklist_map)))
        n = max(min(self.config_len_val, n_valid), 1)
        if n >= self.batch_size:  # static-shape val batches
            n = (n // self.batch_size) * self.batch_size
        if self.mesh is not None:  # and tile the data axis
            n_data = int(self.mesh.shape["data"])
            n = max((n // n_data) * n_data, n_data)
        k_sample, k_gen = jax.random.split(self._next_key())
        uniform = self.ccv._replace(
            sample_weight_map=jnp.ones_like(self.ccv.sample_weight_map))
        oid, vid, gid, occ = sample_triplets(uniform, k_sample, n, replace=False)
        self.ccv = self.ccv._replace(occurrence_map=occ)
        self.generated_val = self._generate_poses(oid, vid, gid, k_gen)
        logger.info(f"val sweep: {n} triplets drawn w/o replacement "
                    f"({n_valid} non-blacklisted of {O * V * G})")

    def should_val(self, epoch_idx: int) -> bool:
        """Whether the dedicated val pass runs after this epoch
        (VAL_LEN configured + VAL_START_EPOCH/VAL_FREQ gates)."""
        return (self.use_synth and self.has_val_sweep
                and epoch_idx + 1 >= self.val_start_epoch
                and epoch_idx % self.val_freq == self.val_freq - 1)

    def len_val(self) -> int:
        if self.generated_val is None:
            return 0
        return max(int(self.generated_val.obj_id.shape[0]) // self.batch_size, 1)

    def iter_val(self) -> Iterator[Dict]:
        """Pure-synth val batches rendered from the val pose cache, in
        draw order (each triplet exactly once)."""
        if self.generated_val is None:
            raise RuntimeError("prepare_val() must run before iter_val()")
        n = int(self.generated_val.obj_id.shape[0])
        bs = min(self.batch_size, n)
        for s in range(0, n - bs + 1, bs):
            sidx = jnp.arange(s, s + bs, dtype=jnp.int32)
            if self.mesh is not None:
                from artiboost_tpu.parallel.mesh import batch_sharding, put_global

                sidx = put_global(sidx, batch_sharding(self.mesh))
            yield self._synth_batch_jit(self._next_key(), self.generated_val, sidx)

    def generate_render_cache(self, is_train: bool = True):
        if is_train:
            self.prepare()
        else:
            self.prepare_val()

    # ------------------------------------------------------------------
    # iteration: mixed real/synth batches
    # ------------------------------------------------------------------
    def _mixed_counts(self):
        real_len = len(self.real_dataset) if self.real_dataset is not None else 0
        synth_len = self.config_len_train if self.use_synth else 0
        total = real_len + synth_len
        if total == 0:
            return 0, 0
        n_synth = int(round(self.batch_size * synth_len / total))
        if real_len == 0:
            n_synth = self.batch_size
        elif self.mesh is not None and n_synth:
            # sharded synth render needs the synth slice to tile the mesh;
            # round to the nearest multiple (keeping at least one per chip
            # and at least one real slice when real data exists)
            n_data = int(self.mesh.shape["data"])
            n_synth = max(int(round(n_synth / n_data)) * n_data, n_data)
            n_synth = min(n_synth, max(self.batch_size - n_data, n_data))
        return self.batch_size - n_synth, n_synth

    def _synth_epoch_perm(self, key: jax.Array) -> np.ndarray:
        """Fresh permutation of the generated pose cache: every synth
        sample is visited once per epoch (MixedDataset parity; slices wrap
        when the epoch needs more draws than poses exist)."""
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        return np.random.RandomState(seed).permutation(
            self.generated.obj_id.shape[0])

    def _sample_synth_idx(self, perm: np.ndarray, b: int, n_synth: int) -> jax.Array:
        start = b * n_synth
        idx = perm[np.arange(start, start + n_synth) % len(perm)]
        sidx = jnp.asarray(idx, jnp.int32)
        if self.mesh is not None:
            from artiboost_tpu.parallel.mesh import batch_sharding, put_global

            sidx = put_global(sidx, batch_sharding(self.mesh))
        return sidx

    def __len__(self) -> int:
        real_len = len(self.real_dataset) if self.real_dataset is not None else 0
        synth_len = self.config_len_train if self.use_synth else 0
        return max((real_len + synth_len) // self.batch_size, 1)

    def __iter__(self) -> Iterator[Dict]:
        n_real, n_synth = self._mixed_counts()
        real_len = len(self.real_dataset) if self.real_dataset is not None else 0
        real_perm = np.random.RandomState(
            int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))
        ).permutation(max(real_len, 1))
        synth_perm = (self._synth_epoch_perm(self._next_key())
                      if (n_synth and self.generated is not None) else None)
        real_ptr = 0
        for bidx in range(len(self)):
            parts = []
            if n_real and self.real_dataset is not None:
                idx = [real_perm[(real_ptr + i) % real_len] for i in range(n_real)]
                real_ptr += n_real
                parts.append(self.real_dataset.sample_batch(idx))
            if n_synth and self.generated is not None:
                k_batch = self._next_key()
                sidx = self._sample_synth_idx(synth_perm, bidx, n_synth)
                parts.append(self._synth_batch_jit(k_batch, self.generated, sidx))
            if not parts:
                raise RuntimeError("ArtiBoostLoader has neither real nor synth data")
            if len(parts) == 1:
                yield parts[0]
            else:
                from artiboost_tpu.utils.batching import union_concat

                yield union_concat(parts, "ArtiBoostLoader.__iter__")

    def iter_parts(self) -> Iterator:
        """Return an iterator of (real_batch | None, synth_idx | None) pairs
        for the fused train step (``parallel.make_fused_train_step``): the
        synth half is NOT rendered here — the fused step renders it inside
        the same device program as fwd/bwd.

        All JAX RNG/device work happens eagerly on the calling thread so the
        returned generator is safe to drain from a prefetch worker thread
        (only numpy dataset decode remains inside)."""
        n_real, n_synth = self._mixed_counts()
        n_batches = len(self)
        real_len = len(self.real_dataset) if self.real_dataset is not None else 0
        real_perm = np.random.RandomState(
            int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))
        ).permutation(max(real_len, 1))
        use_synth_now = n_synth and self.generated is not None
        synth_perm = self._synth_epoch_perm(self._next_key()) \
            if use_synth_now else None
        sidx_list = [
            self._sample_synth_idx(synth_perm, b, n_synth)
            if use_synth_now else None
            for b in range(n_batches)
        ]

        def gen():
            real_ptr = 0
            for b in range(n_batches):
                real_batch = None
                if n_real and self.real_dataset is not None:
                    idx = [real_perm[(real_ptr + i) % real_len]
                           for i in range(n_real)]
                    real_ptr += n_real
                    real_batch = self.real_dataset.sample_batch(idx)
                yield real_batch, sidx_list[b]

        return gen()

    # ------------------------------------------------------------------
    # mining
    # ------------------------------------------------------------------
    def step_eval(self, epoch_idx: int, evaluator) -> None:
        """Collect per-triplet val maps from the evaluator and reweight."""
        self.epoch_idx = epoch_idx
        if not self.use_synth:
            return
        maps = []
        for metric in evaluator.metrics_list:
            if isinstance(metric, (ValMetricMean3DEPE2, ValMetricAR2)):
                maps.append(metric.get_averaged_maps())
        if not maps:
            logger.warning("no ValMetric found; skipping ArtiBoost reweight")
            return
        avg = sum(m[0] for m in maps) / len(maps)
        seen = maps[0][1]
        for m in maps[1:]:
            seen = seen & m[1]
        self.sample_reweight(avg, seen, epoch_idx)
        logger.info(f"ArtiBoost finished mining after epoch {epoch_idx}")

    def sample_reweight(self, val_map, seen, epoch_idx: int):
        update = UPDATE_METHODS[self.update_method_key](
            self.ccv.sample_weight_map, val_map, seen,
            self.weight_lower, self.weight_upper,
            dist_lower_threshold=self.dist_lower,
            dist_upper_threshold=self.dist_upper,
            epoch_idx=epoch_idx, n_epochs=self.n_epochs,
        )
        self.ccv = self.ccv._replace(sample_weight_map=update["sample_weight_map"])
        if "dist_lower_ratio" in update:
            ratio = float(update["dist_lower_ratio"])
            self.last_dist_lower_ratio = ratio
            if ratio >= 0:
                logger.info(f"mining epoch {epoch_idx}: dist_lower_ratio "
                            f"{ratio:.2%} of seen triplets solved to within "
                            f"{self.dist_lower}mm")
            if (ratio >= 0 and self.synth_shutdown_ratio > 0
                    and ratio >= self.synth_shutdown_ratio):
                if self.real_dataset is None:
                    logger.warning(
                        f"dist_lower_ratio {ratio:.2%} >= SYNTH_SHUTDOWN_RATIO "
                        f"{self.synth_shutdown_ratio:.2%} but there is no real "
                        "dataset to continue on; keeping synthesis alive")
                else:
                    logger.warning(
                        f"dist_lower_ratio {ratio:.2%} >= SYNTH_SHUTDOWN_RATIO "
                        f"{self.synth_shutdown_ratio:.2%}: early synth shutdown "
                        "(reference method_3 semantics); training continues "
                        "real-only")
                    self.synth_shutdown()

    def synth_shutdown(self):
        self.use_synth = False
        self.generated = None
        self.generated_val = None
        logger.warning("shut down synth dataset engine")

    # ------------------------------------------------------------------
    # checkpoint state (parity: recorder.py:177-226)
    # ------------------------------------------------------------------
    def state_dict(self) -> Dict:
        return {
            "sample_weight_map": np.asarray(self.ccv.sample_weight_map),
            "occurrence_map": np.asarray(self.ccv.occurrence_map),
            "use_synth": self.use_synth,
            "epoch_idx": self.epoch_idx,
            "rng_key": np.asarray(jax.random.key_data(self.key)),
        }

    def load_state_dict(self, state: Dict):
        self.ccv = self.ccv._replace(
            sample_weight_map=jnp.asarray(state["sample_weight_map"]),
            occurrence_map=jnp.asarray(state["occurrence_map"]),
        )
        if not state.get("use_synth", True):
            self.synth_shutdown()
        self.epoch_idx = int(state.get("epoch_idx", 0))
        if "rng_key" in state:
            self.key = jax.random.wrap_key_data(jnp.asarray(state["rng_key"]))
