"""Randomized dynamic-op fuzzing against a model of the reference semantics.

A shadow model tracks the list of stored items by positional id, applying
the reference's id rules (/root/reference/src/utils.jl):
  push      -> new id = n
  push_front-> new id = 0, all ids += 1
  pop       -> removes id n-1
  pop_front -> removes id 0, all ids -= 1
  delete(S) -> survivors renumber by rank

After every op the index's live ids must be exactly {0..n-1}. Every stored
item's identity is pinned by its RECONSTRUCTION (centroid + decoded codes —
fixed at insertion time), so at the end `reconstruct(id)` must equal the
recorded reconstruction of whichever token the model says lives at that id,
and every pop must return the reconstruction of the model's last/first
token. This verifies the full id permutation under arbitrary op
interleavings, not just set membership.
"""

import numpy as np

from tests.conftest import build_random_index


def _apply(model, op, arg=None):
    """model: list of tokens ordered by current id."""
    if op == "push":
        model.append(arg)
    elif op == "push_front":
        model.insert(0, arg)
    elif op == "pop":
        return model.pop()
    elif op == "pop_front":
        return model.pop(0)
    elif op == "delete":
        for i in sorted(arg, reverse=True):
            del model[i]


def test_fuzzed_op_sequences_match_shadow_model(random_data):
    for seed in range(3):
        r = np.random.RandomState(seed)
        idx = build_random_index(random_data)
        n0 = len(idx)
        pool = np.concatenate([
            np.asarray(random_data, np.float32),
            r.rand(64, 10).astype(np.float32)])
        model = list(range(n0))
        recon = {t: idx.reconstruct(t) for t in range(n0)}
        next_tok = n0
        for step in range(12):
            op = r.choice(["push", "push_front", "pop", "pop_front",
                           "delete", "noop"])
            if op == "push" and next_tok < len(pool):
                idx.push(pool[next_tok])
                _apply(model, "push", next_tok)
                recon[next_tok] = idx.reconstruct(len(idx) - 1)
                next_tok += 1
            elif op == "push_front" and next_tok < len(pool):
                idx.push_front(pool[next_tok])
                _apply(model, "push_front", next_tok)
                recon[next_tok] = idx.reconstruct(0)
                next_tok += 1
            elif op == "pop" and len(model) > 5:
                v = idx.pop()
                tok = _apply(model, "pop")
                np.testing.assert_allclose(v, recon[tok], rtol=1e-5,
                                           err_msg=f"{seed}/{step} pop")
            elif op == "pop_front" and len(model) > 5:
                v = idx.pop_front()
                tok = _apply(model, "pop_front")
                np.testing.assert_allclose(v, recon[tok], rtol=1e-5,
                                           err_msg=f"{seed}/{step} pop_front")
            elif op == "delete" and len(model) > 8:
                dels = sorted(set(r.randint(0, len(model), 4).tolist()))
                idx.delete(dels)
                _apply(model, "delete", dels)
            assert len(idx) == len(model), (seed, step, op)
            live = np.sort(idx.store.ids[idx.store.ids >= 0])
            assert np.array_equal(live, np.arange(len(model))), (seed, step, op)
        # full permutation check: whoever the model says lives at id i must
        # reconstruct to that token's recorded vector
        sample = range(0, len(model), max(1, len(model) // 40))
        for cur_id in sample:
            np.testing.assert_allclose(
                idx.reconstruct(cur_id), recon[model[cur_id]], rtol=1e-5,
                err_msg=f"seed {seed} id {cur_id} token {model[cur_id]}")
