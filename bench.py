"""Benchmark: ResNet50 preprocess+train throughput on the real TPU chip.

Measures steady-state imgs/sec/chip for the full fused training step —
contiguous-window batch slice from the HBM-resident uint8 dataset, augmentation
(RandomResizedCrop + flip + color jitter), ImageNet normalize, bf16 ResNet50
forward+backward (frozen prefix pruned from the backward graph), masked-Adam
update with OneCycle schedule — i.e. everything between "raw cached pixels"
and "updated weights".

Baseline: the driver north star of 5,000 imgs/sec/chip (BASELINE.json; the
reference publishes no throughput numbers at all, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 5000.0


def main():
    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from irp_tpu.data.pipeline import CachedDataset, EpochSampler, HBMDataset
    from irp_tpu.models import init_classifier
    from irp_tpu.parallel.mesh import make_mesh, shard_variables
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import make_hbm_epoch_step

    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    intensity = os.environ.get("BENCH_INTENSITY", "medium")
    n_samples = int(os.environ.get("BENCH_SAMPLES", "4096"))

    bn_mode = os.environ.get("BENCH_BN_MODE", "trainable_only")
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    n_classes = 10
    model_cfg = ModelConfig(depth=50, num_classes=n_classes, image_size=224,
                            compute_dtype="bfloat16", bn_stats_mode=bn_mode)
    train_cfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                            batch_size=batch_size)

    rng = np.random.default_rng(0)
    cached = CachedDataset(
        images=rng.integers(0, 255, (n_samples, 256, 256, 3), dtype=np.uint8),
        labels=rng.integers(0, n_classes, n_samples).astype(np.int32),
        keys=[str(i) for i in range(n_samples)],
        class_names=tuple(str(i) for i in range(n_classes)))

    model, variables = init_classifier(model_cfg, jax.random.PRNGKey(0), 224)
    variables = shard_variables(mesh, variables)
    state = create_train_state(model, variables, train_cfg, model_cfg,
                               steps_per_epoch=steps)

    hbm = HBMDataset(cached, mesh)
    sampler = EpochSampler(hbm, batch_size, seed=0)
    # One compiled program per measured block: lax.scan over the steps
    # (single dispatch — the per-step Python overhead on this 1-core host
    # otherwise dominates and hides true device time).
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    aug_dtype = jnp.dtype(os.environ.get("BENCH_AUG_DTYPE", "bfloat16"))
    step = make_hbm_epoch_step(mesh, sampler.per_device, class_weights=None,
                               intensity=intensity, out_size=224,
                               compute_dtype=jnp.bfloat16, unroll=unroll,
                               aug_work_dtype=aug_dtype)

    key = jax.random.PRNGKey(1)
    # Warmup: compile + first execution (the first run of a fresh
    # executable on this TPU pool carries a large one-time cost — up to
    # 100x a steady-state step); then measure best-of-reps, since the chip
    # is time-shared and individual reps see external load.
    off_w = jnp.asarray(sampler.epoch_offsets(steps))
    state, metrics = step(state, hbm.images, hbm.labels, off_w,
                          jax.random.fold_in(key, 0))
    last_loss = float(np.asarray(metrics["loss"])[-1])  # hard sync (D2H)
    reps = max(reps, 1)  # BENCH_REPS=0 would leave dt=inf/last_loss unset

    # block_until_ready is only intermittently synchronous through this
    # TPU tunnel; a scalar readback of the last step's loss is a hard
    # barrier — the loss chains through every scanned step.
    dt = float("inf")
    rep_times = []
    for r in range(reps):
        off_m = jnp.asarray(sampler.epoch_offsets(steps))
        t0 = time.perf_counter()
        state, metrics = step(state, hbm.images, hbm.labels, off_m,
                              jax.random.fold_in(key, 1 + r))
        last_loss = float(np.asarray(metrics["loss"])[-1])
        rep_dt = time.perf_counter() - t0
        rep_times.append(round(1000 * rep_dt / steps, 2))
        dt = min(dt, rep_dt)

    # Eval throughput: scanned epoch over the HBM-resident eval set
    # (uploaded once; contiguous-window slices; running-stats forward).
    from irp_tpu.data.pipeline import HBMEvalSet
    from irp_tpu.train.step import make_hbm_eval_epoch

    hbm_eval = HBMEvalSet(cached, mesh, batch_size)
    eval_epoch = make_hbm_eval_epoch(sampler.per_device, out_size=224,
                                     compute_dtype=jnp.bfloat16)
    eoffs = jnp.asarray(hbm_eval.offsets)
    lg = eval_epoch(state, hbm_eval.images, eoffs)
    float(np.asarray(lg)[-1].reshape(-1)[-1])  # warmup + hard sync
    eval_dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        lg = eval_epoch(state, hbm_eval.images, eoffs)
        float(np.asarray(lg)[-1].reshape(-1)[-1])
        eval_dt = min(eval_dt, time.perf_counter() - t0)
    eval_steps = eoffs.shape[0]
    # count REAL eval images, not the wrap-padded slots
    eval_imgs_per_sec = hbm_eval.n / eval_dt

    n_chips = len(jax.devices())
    imgs_per_sec = steps * batch_size / dt
    per_chip = imgs_per_sec / n_chips
    # epochs/hr on the full Animals-10 train set (26003 - test split)
    epoch_imgs = 20944  # cleaned train split size (26003 * 0.8 approx)
    result = {
        "metric": "resnet50_preproc_train_throughput",
        "value": round(per_chip, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMGS_PER_SEC, 3),
        "batch_size": batch_size,
        "steps": steps,
        "step_ms": round(1000 * dt / steps, 2),
        "rep_step_ms": rep_times,
        "epochs_per_hour": round(3600 * imgs_per_sec / epoch_imgs, 1),
        "n_chips": n_chips,
        "backend": jax.default_backend(),
        "intensity": intensity,
        "final_loss": last_loss,
        "eval_imgs_per_sec_chip": round(eval_imgs_per_sec / n_chips, 1),
        "eval_step_ms": round(1000 * eval_dt / eval_steps, 2),
        "bn_stats_mode": bn_mode,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
