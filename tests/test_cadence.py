"""core/cadence.py: bounded episode-cadence update scheduling."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.core import cadence


def test_bounded_due_drains_debt_across_iterations():
    debt = jnp.zeros((), jnp.int32)
    ran = []
    # burst of 10 due updates, cap 4, then quiet iterations
    for due in [10, 0, 0, 0]:
        n_run, debt = cadence.bounded_due(debt, jnp.asarray(due), 4)
        ran.append(int(n_run))
    assert ran == [4, 4, 2, 0]
    assert int(debt) == 0


def test_uncapped_equals_num_envs_slots():
    # cap 0 → slots = num_envs → any per-iteration burst drains fully
    n_slots = cadence.num_slots(0, 16)
    assert n_slots == 16
    n_run, debt = cadence.bounded_due(
        jnp.zeros((), jnp.int32), jnp.asarray(16), n_slots
    )
    assert int(n_run) == 16 and int(debt) == 0


def test_run_due_updates_applies_exactly_n_run():
    def update_fn(carry, key):
        count, acc = carry
        return count + 1, acc + jax.random.uniform(key)

    carry = (jnp.zeros((), jnp.int32), jnp.zeros(()))
    count, acc = cadence.run_due_updates(
        carry, update_fn, jax.random.PRNGKey(0), jnp.asarray(3), 8
    )
    assert int(count) == 3
    assert float(acc) > 0.0

    # n_run = 0 → no-op
    count0, acc0 = cadence.run_due_updates(
        carry, update_fn, jax.random.PRNGKey(0), jnp.asarray(0), 8
    )
    assert int(count0) == 0 and float(acc0) == 0.0


def test_capped_matches_uncapped_when_due_below_cap():
    """Equivalence note (VERDICT r2 next-4): for small-env configs whose
    per-iteration due never exceeds the cap, the capped schedule runs the
    SAME updates with the SAME keys in the same order."""
    def update_fn(carry, key):
        return carry + jax.random.uniform(key)

    key = jax.random.PRNGKey(42)
    due = jnp.asarray(3)
    # uncapped: slots = num_envs = 16
    out_uncapped = cadence.run_due_updates(
        jnp.zeros(()), update_fn, key, due, 16
    )
    # capped at 8: jax.random.split(key, n)[i] is independent of n, so
    # the first `due` update keys are IDENTICAL — the schedules are
    # bit-equal, not merely equal in update count
    out_capped = cadence.run_due_updates(
        jnp.zeros(()), update_fn, key, due, 8
    )
    np.testing.assert_array_equal(
        np.asarray(out_uncapped), np.asarray(out_capped)
    )
    assert float(out_capped) > 0


def test_slot_scan_inside_jit():
    @jax.jit
    def step(debt, due):
        n_run, debt = cadence.bounded_due(debt, due, 4)
        carry = cadence.run_due_updates(
            jnp.zeros(()), lambda c, k: c + 1.0, jax.random.PRNGKey(0),
            n_run, 4,
        )
        return debt, carry

    debt, ran = step(jnp.zeros((), jnp.int32), jnp.asarray(7))
    assert int(debt) == 3 and float(ran) == 4.0


def test_target_due_uncapped_matches_episode_clock():
    """Uncapped (n_run == due crossings), target_due reproduces the
    raw episode-clock crossing count for multiple-of-train_freq freqs."""
    train_freq, target_freq = 2, 4
    prev_updates = jnp.zeros(())
    total_new, total_old = 0, 0
    episodes_prev = 0
    for episodes in (3, 4, 9, 10, 16):
        due = episodes // train_freq - episodes_prev // train_freq
        n_run = jnp.asarray(due)  # uncapped
        total_new += int(cadence.target_due(
            prev_updates, n_run, train_freq, target_freq))
        total_old += episodes // target_freq - episodes_prev // target_freq
        prev_updates = prev_updates + n_run
        episodes_prev = episodes
    assert total_new == total_old == 4


def test_target_due_defers_with_debt():
    """Capped: targets advance only with EXECUTED updates — 5 crossings
    due but only 2 run ⇒ 2 target steps now, the rest when debt drains
    (ADVICE r3: no target drift over deferred updates)."""
    n_run, debt = cadence.bounded_due(jnp.zeros((), jnp.int32),
                                      jnp.asarray(5), 2)
    assert int(n_run) == 2 and int(debt) == 3
    d1 = cadence.target_due(jnp.zeros(()), n_run, 1, 1)
    assert int(d1) == 2
    # next iteration: debt drains, targets catch up exactly
    n_run2, debt2 = cadence.bounded_due(debt, jnp.asarray(0), 2)
    d2 = cadence.target_due(jnp.asarray(2.0), n_run2, 1, 1)
    assert int(d2) == 2 and int(debt2) == 1
