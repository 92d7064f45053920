"""Step-cost attribution on the real TPU: which part of the fused train
step costs what.

Measures scanned variants of the hot path with bench.py's methodology
(single-dispatch lax.scan, hard scalar sync, best-of-reps on the
time-shared chip).  Variants:

  full          slice + augment(medium) + fwd/bwd + adam   (== bench.py)
  noaug         slice + eval normalize + fwd/bwd + adam
  model         fwd/bwd + adam on pre-normalized bf16 input
  aug_only      slice + augment(medium), no model
  slice_only    slice + bf16 convert only
  aug_nojit     slice + augment without color jitter
  aug_nocrop    slice + flip + center-crop + normalize (low intensity)

Usage: python tools/bench_attrib.py [variant ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(variants):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/irp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from irp_tpu.data.pipeline import CachedDataset, EpochSampler, HBMDataset
    from irp_tpu.models import init_classifier
    from irp_tpu.parallel.mesh import make_mesh, shard_variables
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import _loss_and_updates, _slice_batch
    from irp_tpu.ops.preprocess import augment_batch_fused, center_crop
    from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD

    batch, steps, reps = 256, 20, 4
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    model_cfg = ModelConfig(depth=50, num_classes=10, image_size=224,
                            compute_dtype="bfloat16")
    train_cfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                            batch_size=batch)
    rng = np.random.default_rng(0)
    n = 4096
    cached = CachedDataset(
        images=rng.integers(0, 255, (n, 256, 256, 3), dtype=np.uint8),
        labels=rng.integers(0, 10, n).astype(np.int32),
        keys=[str(i) for i in range(n)],
        class_names=tuple(str(i) for i in range(10)))
    model, variables = init_classifier(model_cfg, jax.random.PRNGKey(0), 224)
    variables = shard_variables(mesh, variables)
    hbm = HBMDataset(cached, mesh)
    sampler = EpochSampler(hbm, batch, seed=0)
    bl = sampler.per_device

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def aug(images_u8, key, intensity="medium"):
        return augment_batch_fused(images_u8, key, intensity, 224,
                                   IMAGENET_MEAN, IMAGENET_STD,
                                   jnp.bfloat16, work_dtype=jnp.bfloat16)

    def evalprep(images_u8):
        x = center_crop(images_u8, 224).astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(jnp.bfloat16)

    def make_scan(body_has_state, body):
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, data_u8, labels_all, offsets, key):
            def sbody(carry, step_in):
                i, off = step_in
                return body(carry, i, off, key)
            carry, out = jax.lax.scan(
                sbody, state, (jnp.arange(offsets.shape[0]), offsets))
            return carry, out
        return run

    def body_full(state, i, off, key):
        im, lb = _slice_batch(hbm_images, hbm_labels, off, bl)
        k = jax.random.fold_in(key, i)
        ka, kd = jax.random.split(k)
        x = aug(im, ka)
        return _loss_and_updates(state, x, lb, kd, None)

    # placeholders bound below per-variant (data passed as args to jit)
    hbm_images, hbm_labels = None, None

    def timed(name, fn, init_carry, args):
        nonlocal hbm_images, hbm_labels
        key = jax.random.PRNGKey(1)
        offs = jnp.asarray(sampler.epoch_offsets(steps))
        carry, out = fn(init_carry, *args, offs, key)
        jax.tree_util.tree_map(
            lambda a: np.asarray(jax.tree_util.tree_leaves(out)[-1])
            if hasattr(a, "shape") else a, ())
        sync = np.asarray(jax.tree_util.tree_leaves(out)[-1])
        float(sync.reshape(-1)[-1])
        best = float("inf")
        all_ms = []
        for r in range(reps):
            offs = jnp.asarray(sampler.epoch_offsets(steps))
            t0 = time.perf_counter()
            carry, out = fn(carry, *args, offs, jax.random.fold_in(key, r))
            sync = np.asarray(jax.tree_util.tree_leaves(out)[-1])
            float(sync.reshape(-1)[-1])
            dt = time.perf_counter() - t0
            all_ms.append(round(1000 * dt / steps, 2))
            best = min(best, dt)
        ms = 1000 * best / steps
        print(f"{name:12s} {ms:7.2f} ms/step  "
              f"{steps * batch / best:8.0f} imgs/s  reps={all_ms}",
              flush=True)
        return ms

    results = {}
    for v in variants:
        if v in ("full", "noaug", "aug_nojit", "aug_nocrop"):
            state = create_train_state(model, variables, train_cfg,
                                       model_cfg, steps_per_epoch=steps)

            def body(state, i, off, key, v=v):
                im, lb = _slice_batch(hbm.images, hbm.labels, off, bl)
                k = jax.random.fold_in(key, i)
                ka, kd = jax.random.split(k)
                if v == "full":
                    x = aug(im, ka)
                elif v == "noaug":
                    x = evalprep(im)
                elif v == "aug_nojit":
                    from irp_tpu.ops.preprocess import (_sample_rrc_boxes,
                                                        resample_crop_batch)
                    xx = im.astype(jnp.bfloat16) / jnp.asarray(
                        255.0, jnp.bfloat16)
                    do_h = jax.random.bernoulli(ka, shape=(batch, 1, 1, 1))
                    xx = jnp.where(do_h, xx[:, :, ::-1, :], xx)
                    t, l, ch, cw = _sample_rrc_boxes(ka, batch, 256, 256,
                                                     (0.8, 1.0))
                    xx = resample_crop_batch(xx, t, l, ch, cw, 224)
                    x = ((xx.astype(jnp.float32) - mean)
                         / std).astype(jnp.bfloat16)
                else:  # aug_nocrop == low intensity
                    x = aug(im, ka, intensity="low")
                new_state, m = _loss_and_updates(state, x, lb, kd, None)
                return new_state, m["loss"]

            fn = make_scan(True, body)
            results[v] = timed(v, fn, state, (hbm.images, hbm.labels))
        elif v == "model_sliced":
            # pre-augmented bf16 dataset resident in HBM; per-step window
            # slice + model — isolates "slice in scan" from "augment"
            import functools

            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            from irp_tpu.parallel.mesh import DATA_AXIS

            state = create_train_state(model, variables, train_cfg,
                                       model_cfg, steps_per_epoch=steps)
            d_ax = mesh.shape[DATA_AXIS]
            n_loc = hbm.local_count
            pre = jnp.asarray(
                rng.standard_normal((d_ax, n_loc, 224, 224, 3)),
                jnp.bfloat16)
            pre = _jax.device_put(pre, NamedSharding(
                mesh, P(DATA_AXIS, None, None, None, None)))
            labs = _jax.device_put(
                jnp.asarray(rng.integers(0, 10, (d_ax, n_loc)), jnp.int32),
                NamedSharding(mesh, P(DATA_AXIS, None)))

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, data, labels, offsets, key):
                def sbody(state, step_in):
                    i, off = step_in
                    x, lb = _slice_batch(data, labels, off, bl)
                    kd = jax.random.fold_in(key, i)
                    s, m = _loss_and_updates(state, x, lb, kd, None)
                    return s, m["loss"]
                return jax.lax.scan(
                    sbody, state, (jnp.arange(offsets.shape[0]), offsets))
            results[v] = timed(v, fn, state, (pre, labs))
        elif v == "model":
            state = create_train_state(model, variables, train_cfg,
                                       model_cfg, steps_per_epoch=steps)
            pre = jnp.asarray(
                rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
            labs = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, x, lb, offsets, key):
                def sbody(state, i):
                    kd = jax.random.fold_in(key, i)
                    s, m = _loss_and_updates(state, x, lb, kd, None)
                    return s, m["loss"]
                return jax.lax.scan(sbody, state,
                                    jnp.arange(offsets.shape[0]))
            results[v] = timed(v, fn, state, (pre, labs))
        elif v in ("aug_only", "slice_only"):
            import functools

            @functools.partial(jax.jit, donate_argnums=())
            def fn(carry, data, labels, offsets, key, v=v):
                def sbody(carry, step_in):
                    i, off = step_in
                    im, lb = _slice_batch(data, labels, off, bl)
                    if v == "aug_only":
                        x = aug(im, jax.random.fold_in(key, i))
                    else:
                        x = im.astype(jnp.bfloat16)
                    # fold into carry so every step is data-dependent
                    return carry + jnp.mean(x, dtype=jnp.float32), carry
                return jax.lax.scan(sbody, carry,
                                    (jnp.arange(offsets.shape[0]), offsets))
            results[v] = timed(v, fn, jnp.float32(0),
                               (hbm.images, hbm.labels))
    print({k: round(val, 2) for k, val in results.items()})


if __name__ == "__main__":
    vs = sys.argv[1:] or ["full", "noaug", "model", "aug_only",
                          "slice_only", "aug_nojit", "aug_nocrop"]
    main(vs)
