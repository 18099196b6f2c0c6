"""Property tests of the KMC clock, porting the reference's pure-algorithm tests of
``fastforward_to_next_jump`` (tests/LMC/test_MDMC.py:10-93): constant-rate
equivalence under a shared draw stream, long-run mean-rate correctness against a
sinusoidal rate, and event placement when only one frame has nonzero rate."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.engine.clock import (
    _draw_key,
    fastforward_events,
    init_clock,
)


def reconstruct_event_times(n_fired, phases, dt):
    """Flatten per-frame event phases into an ordered list of absolute times."""
    times = []
    n_fired = np.asarray(n_fired)
    phases = np.asarray(phases, dtype=np.float64)
    for f in range(len(n_fired)):
        for s in range(n_fired[f]):
            times.append(f * dt + phases[f, s])
    return np.array(times)


def test_constant_rate_matches_direct_exponential_sampling():
    """With a constant rate the time-dependent clock must reproduce plain
    constant-rate KMC exactly (same draw stream => same event times); mirror of
    the reference's test_fastforward_to_next_jump."""
    omegas = [0.03, 0.06, 0.13]
    dts = [0.1, 0.5, 1.3]

    for dt, omega in product(dts, omegas):
        key = jax.random.key(42)
        n_frames = int(120 / (omega * dt)) + 10
        rates = jnp.full((n_frames,), omega)
        n_fired, phases = fastforward_events(rates, dt, key, max_events=6)
        times = reconstruct_event_times(n_fired, phases, dt)
        assert len(times) >= 100

        # Direct constant-rate KMC with the identical per-ordinal draw stream.
        draws = np.array(
            [
                float(jax.random.exponential(_draw_key(key, i)))
                for i in range(100)
            ],
            dtype=np.float64,
        )
        direct_times = np.cumsum(draws / omega)

        np.testing.assert_allclose(times[:100], direct_times, rtol=5e-4, atol=5e-3)
        # KMC time and MD frame agree *internally*: every event's own timestamp
        # lies inside its frame window (exact by construction).
        frames = np.repeat(np.arange(len(np.asarray(n_fired))), np.asarray(n_fired))
        in_frame = times - frames * dt
        assert np.all(in_frame >= 0) and np.all(in_frame <= dt * (1 + 1e-6))
        # Against the f64 oracle, frame indices may jitter by one at frame
        # boundaries (f32 accumulation); never more.
        oracle_frames = np.floor(direct_times / dt + 1e-9).astype(int)
        assert np.max(np.abs(frames[:100] - oracle_frames)) <= 1
        assert np.mean(frames[:100] == oracle_frames) >= 0.9


def test_sinusoidal_rate_long_run_average():
    """Average event rate over a long run must match the time-average of the
    oscillating rate within 1% (reference test_variable_rates_average)."""
    t = np.linspace(0, 200 * np.pi, 10000)
    one_period = 0.06 + 0.02 * np.sin(t)
    average = one_period.mean()
    dt = 0.5
    rates = jnp.asarray(np.tile(one_period, 40), dtype=jnp.float32)

    n_fired, phases = fastforward_events(rates, dt, jax.random.key(7), max_events=6)
    n_fired = np.asarray(n_fired)
    total_events = int(n_fired.sum())
    # time of last event
    last_frame = np.nonzero(n_fired)[0][-1]
    last_phase = np.asarray(phases)[last_frame, n_fired[last_frame] - 1]
    total_time = last_frame * dt + float(last_phase)

    measured = total_events / total_time
    assert abs(measured - average) / average <= 0.01


def test_one_hot_rate_events_land_on_nonzero_frame():
    """All events must land on the single frame per cycle with nonzero rate
    (reference test_variable_rates_index)."""
    period, hot = 117, 73
    one_cycle = np.zeros(period, dtype=np.float32)
    one_cycle[hot] = 0.17
    rates = jnp.asarray(np.tile(one_cycle, 1500))
    dt = 0.22

    n_fired, _ = fastforward_events(rates, dt, jax.random.key(3), max_events=6)
    n_fired = np.asarray(n_fired)
    fired_frames = np.nonzero(n_fired)[0]
    assert len(fired_frames) > 20
    assert np.all(fired_frames % period == hot)


def test_zero_rate_never_fires_and_preserves_draw():
    rates = jnp.zeros(1000)
    key = jax.random.key(0)
    n_fired, _ = fastforward_events(rates, 0.5, key)
    assert int(np.asarray(n_fired).sum()) == 0


def test_clock_vmaps_over_replicas():
    keys = jax.random.split(jax.random.key(0), 16)
    rates = jnp.full((500,), 0.1)

    def run(key):
        n_fired, _ = fastforward_events(rates, 0.5, key)
        return n_fired.sum()

    counts = np.asarray(jax.vmap(run)(keys))
    assert counts.shape == (16,)
    # Different keys give different realisations, same order of magnitude
    assert len(set(counts.tolist())) > 1
    expected = 0.1 * 500 * 0.5
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))


def test_event_ordinal_keying_is_chunk_invariant():
    """Splitting the rate array into chunks and resuming the clock must give the
    identical event sequence — the property that lets the engine stream
    trajectories in arbitrary block sizes."""
    from cmdlmc_tpu.engine.clock import frame_step

    key = jax.random.key(11)
    rng = np.random.RandomState(0)
    rates = jnp.asarray(rng.uniform(0.0, 0.2, size=120), dtype=jnp.float32)

    full_fired, full_phases = fastforward_events(rates, 0.5, key)

    # Manual two-chunk run re-using the final clock state of chunk 1.
    def run_chunk(clock, rates_chunk, frame_offset):
        fired = []
        phases_out = []
        for i in range(rates_chunk.shape[0]):
            rate = rates_chunk[i]
            phases = jnp.full((4,), jnp.nan)

            def apply_fn(aux, k, ph):
                slot, arr = aux
                return slot + 1, arr.at[slot].set(ph)

            clock, (_, phases), n = frame_step(
                clock,
                (jnp.int32(0), phases),
                frame_idx=jnp.int32(frame_offset + i),
                dt=0.5,
                rate_fn=lambda aux, r=rate: r,
                apply_fn=apply_fn,
                key=key,
                max_events=4,
            )
            fired.append(int(n))
            phases_out.append(np.asarray(phases))
        return clock, fired, phases_out

    clock = init_clock(key)
    clock, f1, p1 = run_chunk(clock, rates[:60], 0)
    _, f2, p2 = run_chunk(clock, rates[60:], 60)

    np.testing.assert_array_equal(np.asarray(full_fired), np.array(f1 + f2))
    got = np.array(p1 + p2)
    want = np.asarray(full_phases)
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-1), np.nan_to_num(want, nan=-1), rtol=1e-6
    )
