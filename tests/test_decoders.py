"""KV-cached greedy decode parity.

The cached `sample()` (cross-attention K/V projected once, self-attention K/V
accumulated in static buffers) must emit exactly the tokens of a
full-recompute greedy loop — the reference semantics
(pipeline_model_gat.py:423-443): at step t, re-run the causal-masked decoder
on the whole buffer and take argmax of the logits at position t-1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphvqa_tpu.nn.decoders import FullAnswerDecoder, ProgramDecoder
from graphvqa_tpu.nn.embedding import PaddedEmbed
from graphvqa_tpu.nn.transformer import causal_mask

VOCAB, DIM, HEADS, FFN, LAYERS = 50, 32, 4, 64, 2


def _embed():
    return PaddedEmbed(vocab_size=VOCAB, features=24, pad_idx=1)


@pytest.fixture(scope="module")
def program_decoder():
    dec = ProgramDecoder(text_embed=_embed(), vocab_size=VOCAB,
                         num_queries=3, hidden_dim=DIM, num_heads=HEADS,
                         ffn_dim=FFN, num_layers=LAYERS, dropout=0.0,
                         max_decode_len=8)
    memory = jax.random.normal(jax.random.key(0), (2, 7, DIM))
    tgt = jnp.ones((2 * 3, 8), jnp.int32)
    variables = dec.init({"params": jax.random.key(1)}, memory, tgt)
    return dec, variables, memory


def _mask_specials(logits, dec):
    """sample() argmaxes over emittable tokens only (never <pad>/<start> —
    see nn/decoders._greedy_token); the full-recompute oracle must match."""
    logits = np.asarray(logits).copy()
    logits[..., dec.pad_idx] = -np.inf
    logits[..., dec.sos_idx] = -np.inf
    return logits


def _reference_greedy_program(dec, variables, memory):
    """Full-recompute greedy loop through the teacher-forced __call__."""
    T = dec.max_decode_len
    B = memory.shape[0]
    buf = np.full((B * dec.num_queries, T), dec.sos_idx, np.int32)
    for t in range(1, T):
        logits, _ = dec.apply(variables, memory, jnp.asarray(buf))
        buf[:, t] = np.argmax(_mask_specials(logits[:, t - 1, :], dec),
                              axis=-1)
    return buf


def test_program_sample_matches_full_recompute(program_decoder):
    dec, variables, memory = program_decoder
    tokens, instr = dec.apply(variables, memory, method=dec.sample)
    ref = _reference_greedy_program(dec, variables, memory)
    np.testing.assert_array_equal(np.asarray(tokens), ref)
    assert instr.shape == (dec.num_queries, memory.shape[0], DIM)


def test_program_sample_jits(program_decoder):
    dec, variables, memory = program_decoder
    eager, _ = dec.apply(variables, memory, method=dec.sample)
    jitted, _ = jax.jit(lambda v, m: dec.apply(v, m, method=dec.sample))(
        variables, memory)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))


def test_full_answer_sample_matches_full_recompute():
    dec = FullAnswerDecoder(text_embed=_embed(), vocab_size=VOCAB,
                            hidden_dim=DIM, num_heads=HEADS, ffn_dim=FFN,
                            num_layers=LAYERS, dropout=0.0, max_decode_len=6)
    memory = jax.random.normal(jax.random.key(2), (3, 5, DIM))
    tgt = jnp.ones((3, 6), jnp.int32)
    variables = dec.init({"params": jax.random.key(3)}, memory, tgt)

    T = dec.max_decode_len
    buf = np.full((3, T), dec.sos_idx, np.int32)
    for t in range(1, T):
        logits = dec.apply(variables, memory, jnp.asarray(buf))
        buf[:, t] = np.argmax(_mask_specials(logits[:, t - 1, :], dec),
                              axis=-1)

    tokens = dec.apply(variables, memory, method=dec.sample)
    np.testing.assert_array_equal(np.asarray(tokens), buf)


def test_decode_step_matches_full_decoder():
    """Layer-level check: decode_step over positions == one masked full pass."""
    from graphvqa_tpu.nn.transformer import TransformerDecoder

    dec = TransformerDecoder(LAYERS, DIM, HEADS, FFN, dropout=0.0)
    key = jax.random.key(4)
    tgt = jax.random.normal(key, (2, 5, DIM))
    memory = jax.random.normal(jax.random.key(5), (2, 7, DIM))
    variables = dec.init({"params": jax.random.key(6)}, tgt, memory)
    full = dec.apply(variables, tgt, memory, tgt_mask=causal_mask(5))

    def stepwise(mod):
        cache = mod.init_cache(2, 5)
        cross = mod.precompute_cross_kv(memory)
        outs = []
        for t in range(5):
            y, cache = mod.decode_step(tgt[:, t, :], cache, cross, t)
            outs.append(y)
        return jnp.stack(outs, axis=1)

    stepped = dec.apply(variables, method=stepwise)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-5, atol=2e-5)
