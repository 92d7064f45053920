"""Optimizer semantics vs torch Adam + coupled weight decay, and the
compile-reuse property of injected hyperparameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig, TrainConfig
from irp_tpu.train.state import (TrainState, make_optimizer,
                                 set_opt_hyperparams, trainable_mask)


def _tiny_params():
    # 'head_dense1' path => trainable under the default mask
    return {"head_dense1": {"kernel": jnp.array([[1.0, -2.0],
                                                 [0.5, 3.0]], jnp.float32)}}


def test_matches_torch_adam_coupled_wd():
    """Our chain must reproduce torch.optim.Adam(lr, weight_decay) step for
    step (coupled L2: grad += wd*param BEFORE moments; reference
    model.py:57-59)."""
    torch = pytest.importorskip("torch")

    lr, wd = 1e-2, 1e-3
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    grads = [np.array([[0.1, -0.2], [0.3, 0.05]], np.float32),
             np.array([[-0.05, 0.4], [0.2, -0.1]], np.float32),
             np.array([[0.02, 0.1], [-0.3, 0.2]], np.float32)]

    # the real OneCycle schedule runs on BOTH sides: our optimizer with
    # its native schedule, torch Adam fed the identical per-step lr
    mcfg = ModelConfig(depth=18, num_classes=2)
    tcfg = TrainConfig(learning_rate=lr, weight_decay=wd, batch_size=8,
                       max_epochs=1, steps_per_epoch_override=None)
    tx = make_optimizer(tcfg, mcfg, steps_per_epoch=100)
    params = _tiny_params()
    opt_state = set_opt_hyperparams(tx.init(params), lr, wd)

    from irp_tpu.ops.schedules import onecycle_cosine

    shape = onecycle_cosine(1.0, 100)

    tw2 = torch.nn.Parameter(torch.tensor(w0))
    opt2 = torch.optim.Adam([tw2], lr=lr, weight_decay=wd)
    for i, g in enumerate(grads):
        # torch side: emulate the schedule by scaling lr per step
        for group in opt2.param_groups:
            group["lr"] = lr * float(shape(i))
        opt2.zero_grad()
        tw2.grad = torch.tensor(g)
        opt2.step()

        updates, opt_state = tx.update(
            {"head_dense1": {"kernel": jnp.array(g)}}, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)

    ours = np.asarray(params["head_dense1"]["kernel"])
    np.testing.assert_allclose(ours, tw2.detach().numpy(), atol=1e-6)


def _run_chain_vs_torch(opt_name, make_torch_opt):
    """Shared trajectory harness: our masked chain vs a torch optimizer
    fed the identical per-step OneCycle lr."""
    torch = pytest.importorskip("torch")

    lr, wd = 1e-2, 1e-3
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    grads = [np.array([[0.1, -0.2], [0.3, 0.05]], np.float32),
             np.array([[-0.05, 0.4], [0.2, -0.1]], np.float32),
             np.array([[0.02, 0.1], [-0.3, 0.2]], np.float32)]
    mcfg = ModelConfig(depth=18, num_classes=2)
    tcfg = TrainConfig(learning_rate=lr, weight_decay=wd, batch_size=8,
                       max_epochs=1, optimizer=opt_name)
    tx = make_optimizer(tcfg, mcfg, steps_per_epoch=100)
    params = _tiny_params()
    opt_state = set_opt_hyperparams(tx.init(params), lr, wd)

    from irp_tpu.ops.schedules import onecycle_cosine

    shape = onecycle_cosine(1.0, 100)
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = make_torch_opt(torch, [tw], lr, wd)
    import optax

    for i, g in enumerate(grads):
        for group in topt.param_groups:
            group["lr"] = lr * float(shape(i))
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        updates, opt_state = tx.update(
            {"head_dense1": {"kernel": jnp.array(g)}}, opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["head_dense1"]["kernel"]),
                               tw.detach().numpy(), atol=1e-6)


def test_matches_torch_sgd_momentum():
    """optimizer='sgd' must reproduce torch.optim.SGD(momentum=0.9,
    weight_decay) step for step (coupled L2 enters the momentum buffer)."""
    _run_chain_vs_torch(
        "sgd", lambda torch, ps, lr, wd: torch.optim.SGD(
            ps, lr=lr, momentum=0.9, weight_decay=wd))


def test_matches_torch_adamw_decoupled():
    """optimizer='adamw' must reproduce torch.optim.AdamW (decoupled
    decay: wd*p joins the update AFTER the moments, scaled by lr)."""
    _run_chain_vs_torch(
        "adamw", lambda torch, ps, lr, wd: torch.optim.AdamW(
            ps, lr=lr, weight_decay=wd))


def test_cosine_schedule_matches_torch_closed_form():
    """schedule='cosine' must follow CosineAnnealingLR(eta_min=0):
    lr_t = max_lr * (1 + cos(pi*t/T)) / 2."""
    from irp_tpu.ops.schedules import cosine_anneal

    T = 40
    s = cosine_anneal(1.0, T)
    for t in (0, 1, 7, 20, 39, 40):
        want = 0.5 * (1.0 + np.cos(np.pi * min(t, T) / T))
        np.testing.assert_allclose(float(s(t)), want, atol=1e-6)


def test_schedule_choice_applies_to_updates():
    """'constant' must hold the step size flat where 'onecycle' warms
    up from peak/25 — verified through the actual masked chain."""
    import optax

    mcfg = ModelConfig(depth=18, num_classes=2)
    lr, wd = 1e-2, 0.0
    g = {"head_dense1": {"kernel": jnp.ones((2, 2), jnp.float32)}}
    params = _tiny_params()

    def first_update(schedule):
        tcfg = TrainConfig(learning_rate=lr, weight_decay=wd, batch_size=8,
                           max_epochs=1, optimizer="sgd",
                           schedule=schedule)
        tx = make_optimizer(tcfg, mcfg, steps_per_epoch=100)
        st = set_opt_hyperparams(tx.init(params), lr, wd)
        up, _ = tx.update(g, st, params)
        return float(jnp.abs(up["head_dense1"]["kernel"]).max())

    const = first_update("constant")
    onecycle = first_update("onecycle")
    np.testing.assert_allclose(const, lr, rtol=1e-6)  # flat at peak
    np.testing.assert_allclose(onecycle, lr / 25.0, rtol=1e-5)  # warmup leg
    with pytest.raises(ValueError, match="schedule"):
        first_update("linear")


def test_optimizer_choice_is_structural_and_validated():
    mcfg = ModelConfig(depth=18, num_classes=2)

    def cfg(name):
        return TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                           batch_size=8, max_epochs=5, optimizer=name)

    a = make_optimizer(cfg("adam"), mcfg, 10)
    b = make_optimizer(cfg("sgd"), mcfg, 10)
    c = make_optimizer(cfg("adamw"), mcfg, 10)
    assert a is not b and b is not c and a is not c
    assert make_optimizer(cfg("sgd"), mcfg, 10) is b  # memoized
    with pytest.raises(ValueError, match="optimizer"):
        make_optimizer(cfg("rmsprop"), mcfg, 10)


def test_final_trainer_adopts_searched_recipe_keys(monkeypatch, tmp_path):
    """A searched optimizer/schedule (the --search-optimizer overlay)
    must carry into the final run's TrainConfig — the best trial won
    WITH that knob — while final-stage-pinned fields (seed, scheduler
    mode, epoch budget) stay pinned."""
    import types

    import irp_tpu.train.final as final_mod
    from irp_tpu import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))

    class _FakeTrial:
        params = {"max_epochs": 4, "learning_rate": 1e-3,
                  "weight_decay": 1e-4, "batch_size": 8,
                  "dropout_rate": 0.1, "augmentation_intensity": "low",
                  "patience": 3, "optimizer": "sgd", "schedule": "cosine",
                  "seed": 7}  # pinned: must NOT override the final seed
        user_attrs = {}

    class _FakeStudy:
        best_trial = _FakeTrial()

        def get_trials(self):
            return [self.best_trial]

    class _Stop(RuntimeError):
        pass

    captured = []

    def fake_fit(train_cached, val_cached, info_, model_cfg, train_cfg,
                 **kw):
        captured.append(train_cfg)
        raise _Stop()

    monkeypatch.setattr(final_mod, "fit", fake_fit)
    info = types.SimpleNamespace(num_classes=3)
    with pytest.raises(_Stop):
        final_mod.train_final_model(
            _FakeStudy(), None, None, info,
            experiment="opt_recipe_final", verbose=False)
    (cfg,) = captured
    assert cfg.optimizer == "sgd"
    assert cfg.schedule == "cosine"
    assert cfg.seed == 42           # final-stage pin wins
    assert cfg.scheduler_step == "epoch"


def test_optimizer_cli_flag_lands_in_train_base():
    import argparse

    from irp_tpu.cli.model_args import (add_train_recipe_args,
                                        build_train_base)

    p = argparse.ArgumentParser()
    add_train_recipe_args(p)
    assert build_train_base(p.parse_args([])).optimizer == "adam"
    base = build_train_base(p.parse_args(["--optimizer", "sgd"]))
    assert base.optimizer == "sgd"


def test_frozen_params_get_zero_updates_and_no_moments():
    mcfg = ModelConfig(depth=18, num_classes=2)
    tcfg = TrainConfig(learning_rate=1e-2, weight_decay=1e-3, batch_size=8,
                       max_epochs=1)
    params = {"backbone": {"layer1_block0": {"conv1": {
                  "kernel": jnp.ones((2, 2), jnp.float32)}}},
              "head_dense1": {"kernel": jnp.ones((2, 2), jnp.float32)}}
    tx = make_optimizer(tcfg, mcfg, steps_per_epoch=10)
    opt_state = set_opt_hyperparams(tx.init(params), 1e-2, 1e-3)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    updates, _ = tx.update(grads, opt_state, params)
    frozen_up = updates["backbone"]["layer1_block0"]["conv1"]["kernel"]
    head_up = updates["head_dense1"]["kernel"]
    assert float(jnp.abs(frozen_up).max()) == 0.0
    assert float(jnp.abs(head_up).max()) > 0.0


def test_tx_memoized_across_configs():
    """Same structural config -> identical tx object (jit cache reuse);
    different lr/wd must NOT change the tx (they're runtime values)."""
    mcfg = ModelConfig(depth=18, num_classes=2)
    a = make_optimizer(TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                                   batch_size=8, max_epochs=5), mcfg, 10)
    b = make_optimizer(TrainConfig(learning_rate=7e-3, weight_decay=2e-6,
                                   batch_size=8, max_epochs=5), mcfg, 10)
    assert a is b
    c = make_optimizer(TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                                   batch_size=8, max_epochs=6), mcfg, 10)
    assert c is not a


def test_fit_reuses_compiled_step_across_hyperparams(tmp_path):
    """Two fits with different lr/wd/dropout-free config hit the same
    compiled epoch step (the sweep-scale recompile fix)."""
    from irp_tpu.config import MeshConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit
    from tests.synth import make_synthetic_shards

    meta = make_synthetic_shards(str(tmp_path), num_classes=2, per_class=12,
                                 samples_per_shard=12, seed=1, size=64)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names, size=64)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    mcfg = ModelConfig(depth=18, num_classes=2, image_size=56,
                       compute_dtype="float32")

    def run(lr, wd, dropout=0.3):
        import dataclasses

        m = dataclasses.replace(mcfg, dropout_rate=dropout)
        tcfg = TrainConfig(learning_rate=lr, weight_decay=wd, batch_size=8,
                           max_epochs=1, patience=3, aug_intensity="low",
                           train_samples_per_epoch=16, eval_samples=8,
                           seed=0)
        return fit(data, data, info, m, tcfg, mesh=mesh, mode="hbm")

    r1 = run(1e-3, 1e-5)
    # count compiled-cache misses via the jit function's cache size
    import sys

    fitmod = sys.modules["irp_tpu.train.fit"]
    memo_before = len(fitmod._STEP_MEMO)
    step_fn = next(v for k, v in fitmod._STEP_MEMO.items()
                   if k[0] == "hbm_epoch")
    misses_before = step_fn._cache_size()
    r2 = run(9e-3, 3e-4)  # different hyperparams, same structure
    # dropout is a CONTINUOUS search dimension: a distinct rate per trial
    # must also reuse the compiled program (runtime-injected rate,
    # Classifier._dropout) — this was the last per-trial recompile source
    r3 = run(1e-3, 1e-5, dropout=0.41)
    assert len(fitmod._STEP_MEMO) == memo_before
    assert step_fn._cache_size() == misses_before  # no retrace/recompile
    assert np.isfinite(r2.history["train_loss"][0])
    # and the two runs genuinely trained differently (lr actually applied)
    a = np.asarray(r1.state.params["head_dense2"]["kernel"])
    b = np.asarray(r2.state.params["head_dense2"]["kernel"])
    assert np.abs(a - b).max() > 1e-6
    # dropout actually applied: same lr/wd, different rate -> different run
    c = np.asarray(r3.state.params["head_dense2"]["kernel"])
    assert np.abs(a - c).max() > 1e-6
