# Verlet-style candidate-identity reuse for the top-K fused path
# (ops/topk_sweep.py::topk_tables_verlet): the TPU counterpart of the
# reference's neighbor-list reuse guarantee (topology.py:80-114 — lists built
# with cutoff+buffer stay exact while every atom moved < buffer/2).
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.engine.fused import _nbr_reuse_auto, run_block_fused
from cmdlmc_tpu.ops import topk_sweep as ts
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import HydroniumRates, TopKPairRates

N, P, R, B = 48, 32, 8, 12
L = 10.0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
    cell = Cell.cubic([L, L, L])
    model = TopKPairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0), k=6,
    )
    walk = np.cumsum(
        rng.normal(scale=0.01, size=(2 * B, N, 3)).astype(np.float32), axis=0
    )
    frames = pos[None] + walk
    return cell, model, frames


KL = ts._pad_k(6)


def test_small_drift_freezes_identities(setup):
    cell, model, frames = setup
    topd, topi, resc, ci, cnbr, chg, mode, carry = ts.topk_tables_verlet(
        model, frames[:B], KL, True, None
    )
    # rebuild only at entry; everything after rides the frozen lists
    assert np.asarray(mode)[0] == 2 and np.all(np.asarray(mode)[1:] == 0)
    ref0 = ts.topk_tables(model, frames[:1], KL, False)
    assert np.array_equal(np.asarray(topi[0]), np.asarray(topi[-1]))
    assert np.array_equal(np.asarray(topi[0]), np.asarray(ref0[1][0]))
    # rebuild-frame distances match the per-frame builder (same formula,
    # different op order -> float tolerance)
    assert np.allclose(np.asarray(topd[0]), np.asarray(ref0[0][0]), atol=2e-5)
    # carry reflects the last rebuild (frame 0 here)
    assert np.array_equal(np.asarray(carry.ref_topi), np.asarray(topi[0]))
    assert np.allclose(np.asarray(carry.ref_pos), frames[0])


def test_carry_makes_chunking_invariant(setup):
    cell, model, frames = setup
    whole = ts.topk_tables_verlet(model, frames[:B], KL, True, None, 0)
    a = ts.topk_tables_verlet(model, frames[:6], KL, True, None, 0)
    b = ts.topk_tables_verlet(model, frames[6:B], KL, True, a[-1], 6)
    assert np.allclose(np.asarray(whole[0][6:]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(whole[1][6:]), np.asarray(b[1]))
    assert np.allclose(np.asarray(whole[2][6:]), np.asarray(b[2]))


def test_large_drift_rebuilds_every_frame(setup):
    cell, model, frames = setup
    rng = np.random.RandomState(7)
    big = frames[0][None] + np.cumsum(
        rng.normal(scale=1.5, size=(B, N, 3)).astype(np.float32), axis=0
    )
    got = ts.topk_tables_verlet(model, big, KL, True, None)
    ref = ts.topk_tables(model, big, KL, True)
    assert np.all(np.asarray(got[6]) == 2)  # every frame a rebuild
    assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    assert np.allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-5)
    # law-applied table: zero exactly where the builder's is zero
    assert np.array_equal(np.asarray(got[2]) == 0, np.asarray(ref[2]) == 0)
    assert np.allclose(np.asarray(got[2]), np.asarray(ref[2]), rtol=1e-4)


def test_out_of_range_entries_masked():
    """An entry whose pair distance drifts beyond cutoff+buffer between
    rebuilds (without triggering one: both atoms moved < buffer/2) is masked
    out (rate 0), mirroring the dense path's per-frame cutoff mask."""
    cell = Cell.cubic([40.0, 40.0, 40.0])
    model = TopKPairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0), k=2,
    )
    pos0 = np.full((4, 3), 20.0, np.float32)
    pos0[1, 0] += 4.6  # pair (0, 1) at 4.6 <= cutoff+buffer=5 -> listed
    pos0[2, 1] += 15.0
    pos0[3, 2] += 15.0
    pos1 = pos0.copy()
    pos1[0, 0] -= 0.45  # both drift < buffer/2=1 -> NO rebuild...
    pos1[1, 0] += 0.45  # ...but the pair is now at 5.5 > cutoff+buffer
    block = np.stack([pos0, pos1])
    kl = ts._pad_k(2)
    topd, topi, resc, ci, cnbr, chg, mode, carry = ts.topk_tables_verlet(
        model, block, kl, True, None
    )
    assert np.asarray(mode).tolist() == [2, 0]
    d = np.asarray(topd)
    ids = np.asarray(topi).astype(int)
    slot = np.nonzero(ids[0, :, 0] == 1)[0]
    assert slot.size and d[0, slot[0], 0] == pytest.approx(4.6, abs=1e-4)
    assert d[1, slot[0], 0] >= 1e5  # masked, not reported at 5.5
    assert np.asarray(resc)[1, slot[0], 0] == 0.0


def test_thrash_guard_chunk_invariant(setup):
    """In the thrashing regime (drift triggers a rebuild within a few frames
    of the previous one) the per-frame-rebuild window is keyed on ABSOLUTE
    frame indices with the trigger state carried in NeighborCarry, so the
    schedule — and the tables — cannot depend on chunk boundaries."""
    cell, model, frames = setup
    rng = np.random.RandomState(11)
    nb = 2 * B
    big = frames[0][None] + np.cumsum(
        rng.normal(scale=0.6, size=(nb, N, 3)).astype(np.float32), axis=0
    )
    whole = ts.topk_tables_verlet(model, big, KL, True, None, 0)
    assert np.asarray(whole[6]).sum() > 2 * ts._THRASH_GAP  # guard engaged
    for split in (3, 7, 13):
        a = ts.topk_tables_verlet(model, big[:split], KL, True, None, 0)
        b = ts.topk_tables_verlet(model, big[split:], KL, True, a[-1], split)
        assert np.array_equal(np.asarray(whole[1][split:]), np.asarray(b[1])), split
        assert np.allclose(np.asarray(whole[0][split:]), np.asarray(b[0])), split
        # modes may differ only at the chunk-entry frame (forced rebuild row
        # broadcast); the identity/distance tables above are the contract
        assert np.array_equal(
            np.asarray(whole[6][split + 1:]), np.asarray(b[6][1:])
        ), split
        # carried thrash state matches the uninterrupted walk
        assert b[-1].last_rebuild == whole[-1].last_rebuild
        assert b[-1].thrash_until == whole[-1].thrash_until
        assert b[-1].thresh == pytest.approx(whole[-1].thresh, rel=1e-6)


def test_run_block_reuse_chunk_invariant_and_carry(setup):
    cell, model, frames = setup
    ens = eng.init_replicas(jax.random.key(0), R, N, P, jnp.asarray(frames[0]))
    whole = run_block_fused(
        model, cell, ens, frames[:B], 0, dt=0.5, seed=3, tile=4,
        interpret=True, nbr_reuse=True,
    )
    assert whole.nbr_carry is not None
    half = run_block_fused(
        model, cell, ens, frames[:6], 0, dt=0.5, seed=3, tile=4,
        interpret=True, nbr_reuse=True,
    )
    half = run_block_fused(
        model, cell, half, frames[6:B], 6, dt=0.5, seed=3, tile=4,
        interpret=True, nbr_reuse=True,
    )
    for att in ("occ", "site_of_proton", "t_last_jump", "disp_base"):
        assert np.array_equal(
            np.asarray(getattr(whole.replicas, att)),
            np.asarray(getattr(half.replicas, att)),
        ), att
    # off by default at small N; carry untouched
    off = run_block_fused(
        model, cell, ens, frames[:B], 0, dt=0.5, seed=3, tile=4,
        interpret=True,
    )
    assert off.nbr_carry is None


def test_reuse_statistics_match_per_frame(setup):
    """Reuse changes WHICH tiny-rate far slots are listed, not the physics:
    jump counts agree closely with the per-frame-rebuild run."""
    cell, model, frames = setup
    ens = eng.init_replicas(jax.random.key(0), 64, N, P, jnp.asarray(frames[0]))
    on = run_block_fused(model, cell, ens, frames[:B], 0, dt=0.5, seed=3,
                         tile=8, interpret=True, nbr_reuse=True)
    off = run_block_fused(model, cell, ens, frames[:B], 0, dt=0.5, seed=3,
                          tile=8, interpret=True, nbr_reuse=False)
    j_on = float(np.asarray(on.replicas.jumps).mean())
    j_off = float(np.asarray(off.replicas.jumps).mean())
    assert abs(j_on - j_off) <= 0.15 * max(j_off, 1.0)


def test_auto_rule():
    cell = Cell.cubic([L, L, L])
    law = Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1))
    tk = lambda buf: TopKPairRates(
        cell=cell, law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(buf), k=6
    )
    assert _nbr_reuse_auto(tk(2.0), 4608)
    assert not _nbr_reuse_auto(tk(2.0), 144)  # small N: per-frame oracle
    assert not _nbr_reuse_auto(tk(0.0), 4608)  # no buffer, no validity bound
    hyd = HydroniumRates(
        cell=cell, law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0),
        transform=None, interpolator=None, k=4,
    )
    assert not _nbr_reuse_auto(hyd, 4608)


def test_internal_chunking_bit_exact(setup):
    """run_block_topk's internal frame sub-chunking (stage-1 tables built
    once, kernel consuming slices, mode forced to full-refresh at each chunk
    entry) is bit-exact vs one whole-block launch — for the Verlet AND the
    delta stage-1 paths, including histogram / jump-matrix accumulation."""
    cell, model, frames = setup
    ens = eng.init_replicas(
        jax.random.key(0), R, N, P, jnp.asarray(frames[0]),
        hist_bins=8, track_jump_matrix=True,
    )
    for reuse in (False, True):
        whole = ts.run_block_topk(
            model, ens, frames[:B], 0, dt=0.5, max_events=4, seed=3, tile=4,
            interpret=True, reuse=reuse,
        )
        chunked = ts.run_block_topk(
            model, ens, frames[:B], 0, dt=0.5, max_events=4, seed=3, tile=4,
            interpret=True, reuse=reuse, chunk=5,
        )
        for k in ("occ", "sites", "tlast", "disp_base", "u_rem", "ev_count",
                  "site_disp", "prev_pos", "trunc", "jump_hist", "exposure",
                  "jump_matrix"):
            assert np.allclose(
                np.asarray(whole[k]), np.asarray(chunked[k])
            ), (reuse, k)


def test_checkpoint_roundtrip_with_carry(setup, tmp_path):
    from cmdlmc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cell, model, frames = setup
    ens = eng.init_replicas(jax.random.key(0), R, N, P, jnp.asarray(frames[0]))
    ens = run_block_fused(model, cell, ens, frames[:6], 0, dt=0.5, seed=3,
                          tile=4, interpret=True, nbr_reuse=True)
    keys = jax.random.split(jax.random.key(1), R)
    path = str(tmp_path / "state.npz")
    save_checkpoint(path, ens, keys, 6)
    loaded, keys2, frame, _meta = load_checkpoint(path)
    assert frame == 6
    assert loaded.nbr_carry is not None
    assert np.array_equal(
        np.asarray(loaded.nbr_carry.ref_topi), np.asarray(ens.nbr_carry.ref_topi)
    )
    # resume == uninterrupted: same carry, same tables, same state
    cont = run_block_fused(model, cell, loaded, frames[6:B], 6, dt=0.5,
                           seed=3, tile=4, interpret=True, nbr_reuse=True)
    whole = run_block_fused(model, cell, ens, frames[6:B], 6, dt=0.5,
                            seed=3, tile=4, interpret=True, nbr_reuse=True)
    assert np.array_equal(
        np.asarray(cont.replicas.occ), np.asarray(whole.replicas.occ)
    )
    # a carry-less EnsembleState still round-trips (old-checkpoint shape)
    ens0 = dataclasses.replace(ens, nbr_carry=None)
    save_checkpoint(path, ens0, keys, 3)
    loaded0, *_ = load_checkpoint(path)
    assert loaded0.nbr_carry is None


def test_replayed_frames_do_not_trigger_thrash(setup):
    """A NEGATIVE frame gap (replaying earlier frames against a newer carry,
    e.g. warmup passes) is not drift thrash: the builder stays in plain
    drift-guard mode instead of forcing per-frame rebuilds."""
    cell, model, frames = setup
    first = ts.topk_tables_verlet(model, frames[:B], KL, True, None, 0)
    carry = first[-1]
    assert carry.last_rebuild >= 0.0
    replay = ts.topk_tables_verlet(model, frames[:B], KL, True, carry, 0)
    # small drift: at most a couple of drift-triggered rebuilds, not B
    assert int((np.asarray(replay[6]) == 2).sum()) <= 3
    assert replay[-1].thrash_until == carry.thrash_until


def test_device_schedule_matches_host_loop(setup, monkeypatch):
    """The device-resident scheduler and the host loop must produce the SAME
    schedule, rows, tables and carry (same builder, same f32 threshold and
    drift arithmetic) — chunk invariance across mixed device/bail regimes
    depends on it."""
    cell, model, frames = setup
    dev = ts.topk_tables_verlet(model, frames[:B], KL, True, None, 0)
    orig = ts._device_schedule

    def bail_stub(model, pos, kl, k, up, hc, *rest):
        ri, rv, ref, packed = orig(model, pos, kl, k, up, hc, *rest)
        return ri, rv, ref, packed.at[-1].set(1.0)  # force the host loop

    monkeypatch.setattr(ts, "_device_schedule", bail_stub)
    host = ts.topk_tables_verlet(model, frames[:B], KL, True, None, 0)
    for i, name in enumerate(("topd", "topi", "resc", "ci", "cnbr", "chg",
                              "mode")):
        assert np.array_equal(np.asarray(dev[i]), np.asarray(host[i])), name
    assert np.array_equal(np.asarray(dev[-1].ref_topi),
                          np.asarray(host[-1].ref_topi))
    assert dev[-1].thresh == host[-1].thresh
    assert dev[-1].last_rebuild == host[-1].last_rebuild
    # and with a carry threaded through
    dev2 = ts.topk_tables_verlet(model, frames[B:], KL, True, dev[-1], B)
    monkeypatch.setattr(ts, "_device_schedule", bail_stub)
    host2 = ts.topk_tables_verlet(model, frames[B:], KL, True, host[-1], B)
    assert np.array_equal(np.asarray(dev2[0]), np.asarray(host2[0]))
    assert np.array_equal(np.asarray(dev2[1]), np.asarray(host2[1]))
