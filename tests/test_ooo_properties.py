"""Arrival-order property tests for the watermark-buffered kernels.

The *_ooo state functions promise: ANY arrival order the watermark
contract admits (no row is below the watermark when it arrives)
converges to the batch operator's output exactly.  The integration
tests (test_round11) witness one bounded-disorder arrival through
real Structured Streaming; these tests drive the KERNELS directly
through a simulated GroupState harness so hypothesis can explore
hundreds of adversarial arrival orders per second — random event
times (with ties), random batch splits, and the most aggressive
legal watermark (the smallest event time still in flight), which
finalizes the longest admissible prefix every batch and so exercises
the incremental path far harder than a real 2h-delay run.

Harness fidelity to applyInPandasWithState semantics:
* rows reach the function grouped by key, one call per key per batch
  with data;
* the watermark visible DURING batch b is computed from batches < b;
* a key with NO data in batch b fires with hasTimedOut=True iff its
  registered event-time timeout is below the current watermark;
* a previously set timeout is cleared when the function is invoked
  and must be re-registered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from bugzilla_etl_spark.streaming.snapshot_stream import (
    _N_CARRY,
    PV_FIELDS,
    SESSION_GAP_S,
    _pv_replay,
    _pv_state_ooo,
    _sessionize_state_ooo,
)


class FakeGroupState:
    """Minimal stand-in for pyspark's GroupState (properties only)."""

    def __init__(self) -> None:
        self._val = None
        self.exists = False
        self.hasTimedOut = False
        self.timeout_ms: int | None = None
        self.wm_ms = 0

    def getCurrentWatermarkMs(self) -> int:
        return self.wm_ms

    @property
    def get(self):
        return self._val

    def update(self, v) -> None:
        self._val = v
        self.exists = True

    def setTimeoutTimestamp(self, ms: int) -> None:
        self.timeout_ms = int(ms)


def _drive(kernel, batches: list[pd.DataFrame]) -> list[pd.DataFrame]:
    """Replay ``batches`` (arrival order) through ``kernel`` under the
    most aggressive legal watermark; drain timeouts at the end."""
    states: dict[int, FakeGroupState] = {}
    outs: list[pd.DataFrame] = []
    # wm before batch b = smallest event time still to arrive in
    # batches >= b (strictly legal: every arriving row >= wm) —
    # non-decreasing by construction
    future_min = [0] * (len(batches) + 1)
    future_min[-1] = 1 << 60
    for b in range(len(batches) - 1, -1, -1):
        if not len(batches[b]):
            mn = 1 << 60
        elif "ts_ms" in batches[b]:
            # sub-second mode: the watermark (and legality) use full
            # ts precision while the kernel sees only floored tsl —
            # the mid-second-watermark regime the whole-second
            # harness can never reach
            mn = int(batches[b]["ts_ms"].min())
        else:
            mn = int(batches[b]["tsl"].min()) * 1000
        future_min[b] = min(future_min[b + 1], mn)
    wm = 0
    for b, batch in enumerate(batches):
        wm = max(wm, future_min[b])
        seen = set()
        for uid, g in batch.groupby("user_id", sort=True):
            stt = states.setdefault(int(uid), FakeGroupState())
            stt.wm_ms = wm
            stt.hasTimedOut = False
            stt.timeout_ms = None  # cleared on invocation
            outs.extend(kernel((int(uid),), [g.reset_index(drop=True)], stt))
            seen.add(int(uid))
        # keys without data whose timeout fell below the watermark
        for uid, stt in states.items():
            if uid in seen or stt.timeout_ms is None:
                continue
            if stt.timeout_ms < wm:
                stt.wm_ms = wm
                stt.hasTimedOut = True
                stt.timeout_ms = None
                outs.extend(kernel((uid,), [], stt))
                stt.hasTimedOut = False
    # stream end: watermark passes everything, timeouts drain
    wm = 1 << 61
    for uid, stt in states.items():
        if stt.timeout_ms is not None:
            stt.wm_ms = wm
            stt.hasTimedOut = True
            stt.timeout_ms = None
            outs.extend(kernel((uid,), [], stt))
    return outs


@st.composite
def _event_log(draw):
    """Per-user event logs plus a random batched arrival order."""
    n_users = draw(st.integers(1, 3))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 30))
        for _ in range(n):
            eid += 1
            rows.append(
                (
                    u,
                    eid,
                    draw(st.integers(0, 50_000)),  # tsl: ties allowed
                    draw(st.sampled_from(PV_FIELDS)),
                    draw(
                        st.one_of(
                            st.just(float("nan")),
                            st.integers(0, 5).map(float),
                        )
                    ),
                )
            )
    order = draw(st.permutations(range(len(rows))))
    n_batches = draw(st.integers(1, 6))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, len(rows)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    return rows, order, cuts


def _to_batches(rows, order, cuts) -> list[pd.DataFrame]:
    arranged = [rows[i] for i in order]
    bounds = [0] + list(cuts) + [len(rows)]
    batches = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        chunk = arranged[a:b]
        batches.append(
            pd.DataFrame(
                chunk,
                columns=["user_id", "event_id", "tsl", "event_type", "value"],
            ).astype({"user_id": np.int64, "event_id": np.int64,
                      "tsl": np.int64, "value": np.float64})
        )
    return [b for b in batches if len(b)]


@settings(max_examples=60, deadline=None)
@given(_event_log())
def test_pv_ooo_any_arrival_order_converges(log):
    """previous_values: every legal arrival order replays to the
    byte-identical batch result (same rows, same carried records)."""
    rows, order, cuts = log
    batches = _to_batches(rows, order, cuts)
    if not batches:
        return
    got = pd.concat(
        _drive(_pv_state_ooo, batches), ignore_index=True
    ).sort_values("event_id").reset_index(drop=True)

    full = pd.concat(batches, ignore_index=True)
    wants = []
    for uid, g in full.groupby("user_id", sort=True):
        g = g.sort_values(["tsl", "event_id"]).reset_index(drop=True)
        st0 = [None] * _N_CARRY
        st0[0] = int(g["tsl"].iloc[0])
        res, _ = _pv_replay(int(uid), st0, g)
        wants.append(res)
    want = pd.concat(wants, ignore_index=True).sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


@st.composite
def _event_log_subsec(draw):
    """Like _event_log but events carry sub-second ts precision: the
    watermark advances to mid-second positions while the kernel's
    tsl stays floored.  This is the regime the round-11 advice
    flagged — a watermark landing mid-second must NOT finalize that
    second, because a same-floored-second sibling with ts >=
    watermark (and possibly a LOWER event_id) is still a legal
    arrival."""
    n_users = draw(st.integers(1, 2))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 25))
        for _ in range(n):
            eid += 1
            sec = draw(st.integers(0, 40))  # tight range: dense ties
            frac = draw(st.integers(0, 999))
            rows.append(
                (
                    u,
                    eid,
                    sec,
                    sec * 1000 + frac,
                    draw(st.sampled_from(PV_FIELDS)),
                    draw(
                        st.one_of(
                            st.just(float("nan")),
                            st.integers(0, 5).map(float),
                        )
                    ),
                )
            )
    order = draw(st.permutations(range(len(rows))))
    n_batches = draw(st.integers(1, 6))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, len(rows)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    return rows, order, cuts


def _to_batches_subsec(rows, order, cuts) -> list[pd.DataFrame]:
    arranged = [rows[i] for i in order]
    bounds = [0] + list(cuts) + [len(rows)]
    batches = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        chunk = arranged[a:b]
        batches.append(
            pd.DataFrame(
                chunk,
                columns=["user_id", "event_id", "tsl", "ts_ms",
                         "event_type", "value"],
            ).astype({"user_id": np.int64, "event_id": np.int64,
                      "tsl": np.int64, "ts_ms": np.int64,
                      "value": np.float64})
        )
    return [b for b in batches if len(b)]


@settings(max_examples=60, deadline=None)
@given(_event_log_subsec())
def test_pv_ooo_subsecond_watermark_converges(log):
    """previous_values under mid-second watermarks: finalization must
    wait for a second to FULLY pass ((tsl+1)*1000 <= wm) — the
    pre-round-12 strict mask (tsl*1000 < wm) replays floored second X
    while a same-second lower-event_id sibling is still in flight,
    and this test catches that within a few dozen examples."""
    rows, order, cuts = log
    batches = _to_batches_subsec(rows, order, cuts)
    if not batches:
        return
    got = pd.concat(
        _drive(_pv_state_ooo, batches), ignore_index=True
    ).sort_values("event_id").reset_index(drop=True)

    full = pd.concat(batches, ignore_index=True)
    wants = []
    for uid, g in full.groupby("user_id", sort=True):
        g = g.sort_values(["tsl", "event_id"]).reset_index(drop=True)
        st0 = [None] * _N_CARRY
        st0[0] = int(g["tsl"].iloc[0])
        res, _ = _pv_replay(int(uid), st0, g)
        wants.append(res)
    want = pd.concat(wants, ignore_index=True).sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


@settings(max_examples=60, deadline=None)
@given(_event_log_subsec())
def test_sessionize_ooo_subsecond_watermark_converges(log):
    rows, order, cuts = log
    batches = _to_batches_subsec(rows, order, cuts)
    if not batches:
        return
    outs = _drive(_sessionize_state_ooo, batches)
    got_rows = []
    for o in outs:
        got_rows.extend(
            (int(r.user_id), int(r.session_id), int(r.n_events),
             int(r.session_start), int(r.session_end))
            for r in o.itertuples()
        )
    assert len(got_rows) == len(set(got_rows)), "a session emitted twice"
    full = pd.concat(batches, ignore_index=True)
    want_rows = []
    for uid, g in full.groupby("user_id", sort=True):
        for s, n, a, b in _batch_sessions(g["tsl"].to_numpy(np.int64)):
            want_rows.append((int(uid), s, n, a, b))
    assert sorted(got_rows) == sorted(want_rows)


def _batch_sessions(tsl: np.ndarray) -> list[tuple[int, int, int, int]]:
    tsl = np.sort(tsl)
    new = np.concatenate(([True], np.diff(tsl) > SESSION_GAP_S))
    sid = np.cumsum(new)
    out = []
    for s in range(1, sid[-1] + 1):
        m = tsl[sid == s]
        out.append((s, len(m), int(m[0]), int(m[-1])))
    return out


@settings(max_examples=60, deadline=None)
@given(_event_log())
def test_sessionize_ooo_any_arrival_order_converges(log):
    """sessionize: every legal arrival order yields exactly the batch
    session set, each session exactly once."""
    rows, order, cuts = log
    batches = _to_batches(rows, order, cuts)
    if not batches:
        return
    outs = _drive(_sessionize_state_ooo, batches)
    got_rows = []
    for o in outs:
        got_rows.extend(
            (int(r.user_id), int(r.session_id), int(r.n_events),
             int(r.session_start), int(r.session_end))
            for r in o.itertuples()
        )
    assert len(got_rows) == len(set(got_rows)), "a session emitted twice"

    full = pd.concat(batches, ignore_index=True)
    want_rows = []
    for uid, g in full.groupby("user_id", sort=True):
        for s, n, a, b in _batch_sessions(g["tsl"].to_numpy(np.int64)):
            want_rows.append((int(uid), s, n, a, b))
    assert sorted(got_rows) == sorted(want_rows)


@settings(max_examples=40, deadline=None)
@given(_event_log())
def test_pv_ooo_state_is_exactly_the_watermark_suffix(log):
    """The 100 TB state-size claim, as an invariant: after every
    batch, a key's buffered rows are EXACTLY its arrived events with
    ts >= the watermark at the key's LAST INVOCATION (a key drains
    only when invoked — by data or by its event-time timeout) —
    state is the non-finalizable suffix, bounded by (arrival rate x
    watermark horizon), never by stream length."""
    rows, order, cuts = log
    batches = _to_batches(rows, order, cuts)
    if not batches:
        return
    states: dict[int, FakeGroupState] = {}
    future_min = [0] * (len(batches) + 1)
    future_min[-1] = 1 << 60
    for b in range(len(batches) - 1, -1, -1):
        mn = (
            int(batches[b]["tsl"].min()) * 1000
            if len(batches[b])
            else (1 << 60)
        )
        future_min[b] = min(future_min[b + 1], mn)
    arrived: dict[int, list[tuple[int, int]]] = {}
    last_inv_wm: dict[int, int] = {}
    wm = 0
    for b, batch in enumerate(batches):
        wm = max(wm, future_min[b])
        seen = set()
        for uid, g in batch.groupby("user_id", sort=True):
            stt = states.setdefault(int(uid), FakeGroupState())
            stt.wm_ms = wm
            stt.hasTimedOut = False
            stt.timeout_ms = None
            list(_pv_state_ooo((int(uid),), [g.reset_index(drop=True)], stt))
            arrived.setdefault(int(uid), []).extend(
                zip(g["event_id"].tolist(), g["tsl"].tolist())
            )
            last_inv_wm[int(uid)] = wm
            seen.add(int(uid))
        for uid, stt in states.items():
            if uid in seen or stt.timeout_ms is None:
                continue
            if stt.timeout_ms < wm:
                stt.wm_ms = wm
                stt.hasTimedOut = True
                stt.timeout_ms = None
                list(_pv_state_ooo((uid,), [], stt))
                stt.hasTimedOut = False
                last_inv_wm[uid] = wm
        for uid, stt in states.items():
            if not stt.exists:
                continue
            buf_eids = sorted(stt.get[_N_CARRY])
            lw = last_inv_wm[uid]
            expect = sorted(
                e for e, t in arrived.get(uid, []) if t * 1000 >= lw
            )
            assert buf_eids == expect, (
                f"user {uid} batch {b}: buffered {buf_eids} !="
                f" last-invocation watermark suffix {expect}"
            )
