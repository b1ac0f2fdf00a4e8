"""Opt-in state TTL for the STRICT ordered-fold family (round 10):
per-key state is one small tuple — bounded by design — but a
years-lived stream over an unbounded key universe accretes forever
under NoTimeout. With ``state_ttl_us`` set, a key idle past the TTL
is evicted via an event-time timeout and a re-arrival restarts the
recurrence cleanly; with it unset, behavior is bit-identical to the
round-9 semantics (no watermark, no eviction)."""

import datetime

import pytest

from tests.test_streaming_buffered import _drain

BASE = datetime.datetime(2026, 1, 1)
MIN_US = 60_000_000


def _ts(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


EWMA_SCHEMA = "user_id long, ts timestamp, x_units long"
# key 1 folds 100 then 200 (acc 100 -> 125), goes idle; key 2 keeps the
# event clock moving far past the 10-minute TTL; key 1 then returns
EWMA_BATCHES = [
    [(1, _ts(0), 100), (1, _ts(1), 200), (2, _ts(1), 5)],
    [(2, _ts(100), 5)],   # watermark after this batch ≈ 90 min
    [(2, _ts(101), 5)],   # key 1's timeout (1 + 10 min) fires here
    [(1, _ts(102), 0), (2, _ts(102), 5)],
]


def test_ewma_ttl_evicts_idle_key(spark, tmp_path):
    """Key idle past the TTL is evicted; its re-arrival restarts the
    recurrence from scratch (acc = first new x, NOT a continuation)."""
    from smartbots_etl_facturas_spark.streaming.timeseries import (
        ewma_stateful,
    )

    out = _drain(
        spark, EWMA_BATCHES, EWMA_SCHEMA, tmp_path,
        lambda s: ewma_stateful(s, state_ttl_us=10 * MIN_US),
        mode="append",
    )
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r.ewma_units)
    assert by_key[1] == [100, 125, 0]      # 0, not 125 - 31 = 94
    assert by_key[2] == [5, 5, 5, 5]       # active key: never evicted


def test_ewma_without_ttl_keeps_state_forever(spark, tmp_path):
    """Default None: same delivery, the idle key's accumulator
    survives and the late return CONTINUES the recurrence — the exact
    round-9 semantics."""
    from smartbots_etl_facturas_spark.streaming.timeseries import (
        ewma_stateful,
    )

    out = _drain(
        spark, EWMA_BATCHES, EWMA_SCHEMA, tmp_path,
        lambda s: ewma_stateful(s), mode="append",
    )
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r.ewma_units)
    assert by_key[1] == [100, 125, 94]     # 125 + trunc((0-125)/4) = 94


def test_funnel_ttl_evicts_idle_user(spark, tmp_path):
    """A user parked at stage 2 is evicted after idling past the TTL;
    their return restarts the greedy walk at stage 0 (the returning
    'view' re-advances to exactly stage 1)."""
    from smartbots_etl_facturas_spark.streaming.funnel import (
        funnel_stateful,
    )

    schema = "user_id long, ts timestamp, event_type string"
    batches = [
        [(1, _ts(0), "view"), (1, _ts(1), "cart"), (2, _ts(1), "view")],
        [(2, _ts(100), "view")],
        [(2, _ts(101), "view")],          # user 1's timeout fires
        [(1, _ts(102), "view")],          # fresh walk: stage 1, not 3
    ]
    out = _drain(
        spark, batches, schema, tmp_path,
        lambda s: funnel_stateful(s, ["view", "cart", "buy"],
                                  state_ttl_us=10 * MIN_US),
    )
    last = {}
    for r in out:
        last[r.user_id] = r.stage
    assert last[1] == 1                    # reset, then one 'view'
    assert last[2] == 1                    # active user unaffected


def test_ttl_validation():
    """Non-positive TTLs are rejected up front."""
    from smartbots_etl_facturas_spark.streaming.timeseries import (
        _validate_ttl,
    )

    _validate_ttl(None)
    _validate_ttl(1)
    with pytest.raises(ValueError, match="state_ttl_us"):
        _validate_ttl(0)
    with pytest.raises(ValueError, match="state_ttl_us"):
        _validate_ttl(-5)


def test_funnel_ttl_not_refreshed_by_non_advancing_events(spark, tmp_path):
    """Round-11 ADVICE: TTL arms from the ACCEPTED-event bound only.
    A user parked at the terminal stage keeps sending events that
    cannot advance the walk — those must NOT refresh the TTL (the
    documented contract is idle = no accepted events, not no
    arrivals), so the user evicts and a later return starts a fresh
    walk."""
    from smartbots_etl_facturas_spark.streaming.funnel import (
        funnel_stateful,
    )

    schema = "user_id long, ts timestamp, event_type string"
    batches = [
        # user 1 completes the funnel at minute 2 (TTL arms at 12)
        [(1, _ts(0), "view"), (1, _ts(1), "cart"), (1, _ts(2), "buy"),
         (2, _ts(2), "view")],
        # minute 50: a NON-advancing event for user 1 (stage is
        # terminal) — under the old batch-max arming this would
        # re-arm at minute 60 and the eviction below never fires
        [(1, _ts(50), "view"), (2, _ts(50), "view")],
        # user 1 absent; watermark (~minute 41) passes the minute-12
        # timeout -> evicted
        [(2, _ts(51), "view")],
        # fresh walk: exactly one 'view' -> stage 1, not 3
        [(1, _ts(52), "view")],
    ]
    out = _drain(
        spark, batches, schema, tmp_path,
        lambda s: funnel_stateful(s, ["view", "cart", "buy"],
                                  state_ttl_us=10 * MIN_US),
    )
    last = {}
    for r in out:
        last[r.user_id] = r.stage
    assert last[1] == 1


def test_pre_1970_events_fold_on_fresh_keys(spark, tmp_path):
    """Round-11 streaming review: the strict fold family's fresh-state
    bound sentinel was -1, silently dropping pre-epoch (negative
    micros) events — diverging from the batch twin. Now MIN_US."""
    from smartbots_etl_facturas_spark.streaming.timeseries import (
        ewma_stateful,
    )

    t0 = datetime.datetime(1969, 12, 31, 23, 0)   # pre-epoch
    t1 = datetime.datetime(1969, 12, 31, 23, 30)
    out = _drain(
        spark,
        [[(1, t0, 100)], [(1, t1, 200)]],
        EWMA_SCHEMA, tmp_path, lambda s: ewma_stateful(s), mode="append",
    )
    assert [r.ewma_units for r in out] == [100, 125]
