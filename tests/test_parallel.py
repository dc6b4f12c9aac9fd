"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 item 5):
sharded loss/grad == single-device loss/grad, cross-'k' logsumexp parity,
and a short sharded training run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from dgps_with_iwvi_tpu.models import (
    DGPConfig,
    GPLayerConfig,
    LVLayerConfig,
    elbo,
    init_dgp,
)
from dgps_with_iwvi_tpu.parallel import (
    make_mesh,
    make_parallel_trainer,
    replicate,
    shard_arrays,
)
from dgps_with_iwvi_tpu.training import TrainConfig
from dgps_with_iwvi_tpu.training.train import _merge_params, _split_params, make_trainer

KEY = jax.random.PRNGKey(0)


def _data(n=128, d=3, dtype=jnp.float64):
    kx, ky = jax.random.split(KEY)
    X = jax.random.normal(kx, (n, d), dtype)
    Y = jnp.sin(X[:, :1]) + 0.05 * jax.random.normal(ky, (n, 1), dtype)
    return X, Y


def _expected_global_batch(X, Y, n_dp, B_local, key):
    """Reproduce the sharded minibatch selection on the host."""
    N_local = X.shape[0] // n_dp
    Xs = X.reshape(n_dp, N_local, -1)
    Ys = Y.reshape(n_dp, N_local, -1)
    kb, _ = jax.random.split(key)
    xs, ys = [], []
    for i in range(n_dp):
        idx = jax.random.randint(jax.random.fold_in(kb, i), (B_local,), 0, N_local)
        xs.append(Xs[i][idx])
        ys.append(Ys[i][idx])
    return jnp.concatenate(xs), jnp.concatenate(ys)


class TestShardedParity:
    def test_loss_and_grad_match_single_device_deterministic_model(self):
        """'G' VI model: no sampling randomness -> the sharded step's loss &
        grads must EQUAL the single-device loss & grads on the same global
        batch (exercises psum scaling + KL bookkeeping exactly)."""
        n_dp, n_k = 4, 2
        mesh = make_mesh(n_dp, n_k)
        X, Y = _data(n=128)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            # S=2 divides over n_k=2 (asserted since r4); the model is
            # deterministic, so the reference S=1 elbo below is identical
            num_data=X.shape[0], objective="vi", num_samples=2)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        tc = TrainConfig(lr=1e-2, natgrad="final", minibatch_size=32,
                         iterations=1, steps_per_call=1)

        init_fn, step_fn, _, _ = make_parallel_trainer(cfg, tc, mesh)
        state = init_fn(params)
        state = replicate(mesh, state)
        Xs, Ys = shard_arrays(mesh, X, Y)
        skey = jax.random.PRNGKey(123)
        new_state, loss = jax.jit(step_fn)(state, Xs, Ys, skey)

        # host-side reference on the identical global batch
        xb, yb = _expected_global_batch(X, Y, n_dp, 32 // n_dp, skey)
        layer_ids = (0,)
        natvars, rest = _split_params(params, layer_ids)

        def ref_loss(nv, r):
            p = _merge_params(r, nv, layer_ids)
            return -elbo(p, cfg, xb, yb, KEY)  # key unused: deterministic

        ref_val, (g_nat, g_rest) = jax.value_and_grad(
            ref_loss, argnums=(0, 1))(natvars, rest)
        np.testing.assert_allclose(float(loss), float(ref_val), rtol=1e-10)

        # one single-device natgrad+Adam step from the same grads
        from dgps_with_iwvi_tpu.training import natgrad as ng
        import optax
        nv_ref = ng.natgrad_update(natvars, g_nat, tc.gamma)
        adam = optax.adam(tc.lr)
        upd, _ = adam.update(g_rest, adam.init(rest), rest)
        rest_ref = optax.apply_updates(rest, upd)
        np.testing.assert_allclose(
            np.asarray(new_state.natvars[0]["q_S"]),
            np.asarray(nv_ref[0]["q_S"]), rtol=1e-8, atol=1e-10)
        # psum reduction order differs from the host-side sum; Adam's
        # sqrt-normalization amplifies that to ~1e-8 relative
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(new_state.rest)[0]),
            np.asarray(jax.tree.leaves(rest_ref)[0]), rtol=1e-6, atol=1e-9)

    def test_cross_k_logsumexp(self):
        """pmax/psum logsumexp over a sharded K axis == jax.nn.logsumexp."""
        mesh = make_mesh(1, 8)
        lw = jax.random.normal(KEY, (8 * 5, 16), jnp.float64) * 3.0

        def body(lw_local):  # [5, 16] per device
            m = lax.pmax(jnp.max(lw_local, axis=0), "k")
            s = lax.psum(jnp.sum(jnp.exp(lw_local - m), axis=0), "k")
            return m + jnp.log(s)

        out = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P("k", None), out_specs=P(),
            check_vma=False))(lw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jax.nn.logsumexp(lw, axis=0)),
            rtol=1e-12)

    def test_sharded_iw_training_improves(self):
        """LGG IW K=8 over a 4x2 mesh: loss decreases, params stay replicated."""
        n_dp, n_k = 4, 2
        mesh = make_mesh(n_dp, n_k)
        X, Y = _data(n=256, d=4)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=4, d_y=1),
                GPLayerConfig(d_in=5, d_out=4, num_inducing=8),
                GPLayerConfig(d_in=4, d_out=1, num_inducing=8, final=True),
            ),
            num_data=256, objective="iw", num_iw_samples=8)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        tc = TrainConfig(lr=1e-2, gamma=0.05, natgrad="final",
                         minibatch_size=64, iterations=60, steps_per_call=30)
        init_fn, _, chunk_fn, params_fn = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        chunk_jit = jax.jit(chunk_fn)
        state, l1 = chunk_jit(state, Xs, Ys, jax.random.PRNGKey(1))
        state, l2 = chunk_jit(state, Xs, Ys, jax.random.PRNGKey(2))
        assert float(jnp.mean(l2)) < float(jnp.mean(l1)), (l1.mean(), l2.mean())
        trained = params_fn(state)
        # replicated state: all leaves finite, single logical value
        for leaf in jax.tree.leaves(trained):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_k_must_divide(self):
        import pytest

        mesh = make_mesh(2, 4)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=4, final=True),),
            num_data=10, objective="iw", num_iw_samples=6)
        with pytest.raises(AssertionError):
            make_parallel_trainer(cfg, TrainConfig(), mesh)

    def test_vi_s_must_divide(self):
        """S=1 over n_k=2 must refuse, not silently run S_global=2 (a
        different, lower-variance VI estimator than the single-device run)."""
        import pytest

        mesh = make_mesh(2, 2)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=4, final=True),),
            num_data=10, objective="vi", num_samples=1)
        with pytest.raises(AssertionError):
            make_parallel_trainer(cfg, TrainConfig(), mesh)

    def test_sharded_gamma_warmup_matches_single_device_schedule(self):
        """At step 0 with warm-up on, the sharded natgrad step must use
        gamma_start (not full gamma) — regression for the silently-ignored
        TrainConfig.gamma_warmup in the parallel trainer."""
        n_dp, n_k = 4, 2
        mesh = make_mesh(n_dp, n_k)
        X, Y = _data(n=128)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=X.shape[0], objective="vi", num_samples=2)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        skey = jax.random.PRNGKey(123)
        deltas = {}
        natvars0 = _split_params(params, (0,))[0]
        S0 = np.asarray(natvars0[0]["q_S"])
        for warmup in (0, 500):
            tc = TrainConfig(lr=1e-2, gamma=0.5, gamma_start=1e-4,
                             gamma_warmup=warmup, natgrad="final",
                             minibatch_size=32, iterations=1, steps_per_call=1)
            init_fn, step_fn, _, _ = make_parallel_trainer(cfg, tc, mesh)
            state = replicate(mesh, init_fn(params))
            Xs, Ys = shard_arrays(mesh, X, Y)
            new_state, _ = jax.jit(step_fn)(state, Xs, Ys, skey)
            deltas[warmup] = float(
                np.abs(np.asarray(new_state.natvars[0]["q_S"]) - S0).max())
        assert deltas[500] < deltas[0] / 20, deltas

        # exactness: warm-up step == natgrad_update at gamma_start on the
        # same global batch
        from dgps_with_iwvi_tpu.training import natgrad as ng
        xb, yb = _expected_global_batch(X, Y, n_dp, 32 // n_dp, skey)

        def ref_loss(nv):
            p = _merge_params(_split_params(params, (0,))[1], nv, (0,))
            return -elbo(p, cfg, xb, yb, KEY)

        g_nat = jax.grad(ref_loss)(natvars0)
        nv_ref = ng.natgrad_update(natvars0, g_nat, 1e-4)
        tc = TrainConfig(lr=1e-2, gamma=0.5, gamma_start=1e-4,
                         gamma_warmup=500, natgrad="final",
                         minibatch_size=32, iterations=1, steps_per_call=1)
        init_fn, step_fn, _, _ = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        new_state, _ = jax.jit(step_fn)(state, Xs, Ys, skey)
        # psum reduction order vs the host-side sum leaves ~1e-9 absolute;
        # the semantic check (gamma_start=1e-4, not gamma=0.5 — a 5000x
        # difference in the update) is far above that
        np.testing.assert_allclose(
            np.asarray(new_state.natvars[0]["q_S"]),
            np.asarray(nv_ref[0]["q_S"]), rtol=1e-6, atol=1e-8)

    def test_global_row_ids_map_padded_rows_to_sources(self):
        """Padded shard positions alias HEAD rows, not the clamped last row."""
        from dgps_with_iwvi_tpu.parallel.sharding import global_row_ids

        num_data, n_dp = 126, 4          # padded to 128, N_local = 32
        N_local = 32
        idx = jnp.arange(N_local)
        got = np.asarray(global_row_ids(3, idx, N_local, num_data))
        # last shard covers global positions 96..127; 126 -> 0, 127 -> 1
        expect = np.concatenate([np.arange(96, 126), [0, 1]])
        np.testing.assert_array_equal(got, expect)
        # all shards: every id in range, sources covered exactly
        ids = np.concatenate([
            np.asarray(global_row_ids(i, idx, N_local, num_data))
            for i in range(n_dp)])
        assert ids.min() >= 0 and ids.max() < num_data

    def test_sharded_nonamortized_lv_with_padding(self):
        """Non-amortized LV model, N not divisible by n_dp: trains finitely
        and every per-datapoint q(w) row it touches is a real row."""
        mesh = make_mesh(4, 2)
        X, Y = _data(n=126, d=3)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=3, d_y=1, amortized=False,
                              num_data=126),
                GPLayerConfig(d_in=4, d_out=1, num_inducing=6, final=True),
            ),
            num_data=126, objective="iw", num_iw_samples=4)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        tc = TrainConfig(lr=1e-2, gamma=0.05, natgrad="final",
                         minibatch_size=32, iterations=20, steps_per_call=10)
        init_fn, _, chunk_fn, params_fn = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        cj = jax.jit(chunk_fn)
        state, l1 = cj(state, Xs, Ys, jax.random.PRNGKey(1))
        state, l2 = cj(state, Xs, Ys, jax.random.PRNGKey(2))
        assert float(jnp.mean(l2)) < float(jnp.mean(l1))
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree.leaves(params_fn(state)))

    def test_sharded_checkpoint_save_restore_onto_mesh(self, tmp_path):
        """Orbax save of a mesh-replicated TrainState and restore onto the
        mesh: values bit-identical, shardings preserved, training continues
        (multi-host-readiness item, SURVEY.md §5 'DCN for checkpoints')."""
        from dgps_with_iwvi_tpu.training.checkpoint import (
            restore_checkpoint, save_checkpoint)

        mesh = make_mesh(4, 2)
        X, Y = _data(n=128)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=3, d_y=1),
                GPLayerConfig(d_in=4, d_out=1, num_inducing=6, final=True),
            ),
            num_data=128, objective="iw", num_iw_samples=4)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        tc = TrainConfig(lr=1e-2, gamma=0.05, natgrad="final",
                         minibatch_size=32, iterations=20, steps_per_call=10)
        init_fn, _, chunk_fn, params_fn = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        cj = jax.jit(chunk_fn)
        state, _ = cj(state, Xs, Ys, jax.random.PRNGKey(1))

        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, int(state.step), state, KEY)
        like = {"state": replicate(mesh, init_fn(params)), "key": KEY}
        restored = restore_checkpoint(ckpt, int(state.step), like)["state"]
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored leaves live on the mesh and training continues from them
        st2, l2 = cj(restored, Xs, Ys, jax.random.PRNGKey(2))
        ref2, l2_ref = cj(state, Xs, Ys, jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l2_ref))

    def test_fit_mesh_resume_matches_uninterrupted(self, tmp_path):
        """fit(mesh=...) resume: saving mid-run and resuming with
        fit(state=restored, mesh=mesh) reproduces the uninterrupted
        sharded trajectory exactly (CLI --shard + --resume path)."""
        from dgps_with_iwvi_tpu.training import fit
        from dgps_with_iwvi_tpu.training.checkpoint import (
            restore_checkpoint, save_checkpoint)

        mesh = make_mesh(4, 2)
        X, Y = _data(n=128)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=3, d_y=1),
                GPLayerConfig(d_in=4, d_out=1, num_inducing=6,
                              mean_function="zero", final=True),
            ),
            num_data=128, objective="iw", num_iw_samples=4)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        tc = TrainConfig(lr=1e-2, gamma=0.05, natgrad="final",
                         minibatch_size=32, iterations=40, steps_per_call=10)
        # uninterrupted run, checkpointing at step 20
        ckpt = str(tmp_path / "ck")

        def cb(step, loss, st):
            if step == 20:
                save_checkpoint(ckpt, step, st, KEY)

        ref, _ = fit(KEY, cfg, params, X, Y, tc, callback=cb, mesh=mesh)

        init_fn = make_parallel_trainer(cfg, tc, mesh)[0]
        like = {"state": replicate(mesh, init_fn(params)), "key": KEY}
        st0 = restore_checkpoint(ckpt, 20, like)["state"]
        got, _ = fit(KEY, cfg, params, X, Y, tc, state=st0, mesh=mesh)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_evaluate_matches_single_device(self):
        """evaluate(mesh=...) — rows GSPMD-sharded over all 8 devices,
        params replicated — returns IDENTICAL metrics to the single-device
        path (threefry is counter-based per element, so the partitioned
        predictive draws the same samples; VERDICT r2 item 3)."""
        from dgps_with_iwvi_tpu.evaluation import evaluate

        mesh = make_mesh(4, 2)
        X, Y = _data(n=96, d=3, dtype=jnp.float32)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=3, d_y=1),
                GPLayerConfig(d_in=4, d_out=3, num_inducing=6),
                GPLayerConfig(d_in=3, d_out=1, num_inducing=6,
                              mean_function="zero", final=True),
            ),
            num_data=96, objective="iw", num_iw_samples=4, num_samples=8)
        params = init_dgp(KEY, cfg, dtype=jnp.float32)
        ke = jax.random.PRNGKey(3)
        y_std = np.asarray([[2.5]])
        # batch_size already a device-count multiple so the chunking (and
        # thus the per-chunk fold_in keys) is identical in both paths
        kw = dict(y_std=y_std, num_samples=8, batch_size=32)
        ref = evaluate(params, cfg, X, Y, ke, **kw)
        got = evaluate(params, cfg, X, Y, ke, mesh=mesh, **kw)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-6), k

    def test_distributed_initialize_noop_single_process(self):
        from dgps_with_iwvi_tpu.parallel import distributed

        assert distributed.initialize() is False
        assert not distributed.is_multiprocess()

    def test_sharded_alternating_schedule(self):
        """The reference's two-pass natgrad/Adam schedule also works sharded."""
        mesh = make_mesh(4, 2)
        X, Y = _data(n=128, d=3)
        cfg = DGPConfig(
            layers=(
                LVLayerConfig(d_w=1, d_in=3, d_y=1),
                GPLayerConfig(d_in=4, d_out=1, num_inducing=6, final=True),
            ),
            num_data=128, objective="iw", num_iw_samples=4)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        from dgps_with_iwvi_tpu.training.train import TrainConfig as TC
        tc = TC(lr=1e-2, gamma=0.05, natgrad="final", schedule="alternating",
                minibatch_size=32, iterations=40, steps_per_call=20)
        init_fn, _, chunk_fn, params_fn = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        cj = jax.jit(chunk_fn)
        state, l1 = cj(state, Xs, Ys, jax.random.PRNGKey(1))
        state, l2 = cj(state, Xs, Ys, jax.random.PRNGKey(2))
        assert float(jnp.mean(l2)) < float(jnp.mean(l1))
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree.leaves(params_fn(state)))
