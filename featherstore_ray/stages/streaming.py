"""Streaming tumbling-window aggregation with watermarks and late data.

The brief's "streaming window" custom operator: a STATEFUL window machine
(``TumblingWindowState``) that consumes micro-batches incrementally and
emits a window's aggregate exactly once, when the event-time watermark
passes its end. This is the state an unbounded consumer loop (Kafka-style
ingest, a long-lived actor fed by pushes) holds; the semantics:

- watermark = max event_ts seen − ``allowed_lateness``;
- a window [w·width, (w+1)·width) CLOSES (emits) when watermark ≥ its end;
- rows arriving late but inside ``allowed_lateness`` still merge into
  their open window; rows arriving after their window closed are DROPPED
  and counted (``dropped_late`` — the standard beyond-lateness policy);
- ``flush()`` closes everything at end of stream.

``streaming_tumbling`` runs the same machine DISTRIBUTED: one entity-hash
exchange, then each bucket replays its rows in event-time order through
the state machine (arrival order == event order within a bucket, the
in-order-per-key assumption of log-compacted streams). With in-order
input nothing is ever late, so the result equals the batch
``tumbling_aggregate`` — which is exactly the oracle used for it.

State size: O(open windows × entities) per actor/bucket — bounded by
lateness/width, never by stream length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.stages.window import _ts_us, _window_us


class TumblingWindowState:
    """Incremental per-(entity, window) aggregate with watermark closing."""

    def __init__(
        self,
        *,
        entity_col: str,
        ts_col: str,
        value_col: str,
        width,
        allowed_lateness=0,
        round_digits: int | None = 6,
    ):
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.w_us = _window_us(width)
        self.late_us = _window_us(allowed_lateness) if allowed_lateness else 0
        self.round_digits = round_digits
        # (entity, window_id) -> [n_events, value_sum, value_count]
        self.open: dict = {}
        self.max_ts = None
        self.closed_below: int | None = None  # min still-open window id
        self.dropped_late = 0
        self.emitted = 0

    # -- core -------------------------------------------------------------

    def process(self, batch: pd.DataFrame | pa.Table) -> pd.DataFrame:
        """Absorb one micro-batch; return the windows the new watermark
        closes (possibly empty)."""
        if isinstance(batch, pa.Table):
            batch = batch.to_pandas()
        if len(batch):
            ts = _ts_us(batch[self.ts_col])
            win = ts // self.w_us
            vals = batch[self.value_col].to_numpy(
                dtype=np.float64, na_value=np.nan
            )
            ents = batch[self.entity_col].to_numpy()
            if self.closed_below is not None:
                late = win < self.closed_below
                if late.any():
                    self.dropped_late += int(late.sum())
                    keep = ~late
                    ts, win, vals, ents = (
                        ts[keep], win[keep], vals[keep], ents[keep]
                    )
            if len(ts):
                agg = (
                    pd.DataFrame({"e": ents, "w": win, "v": vals})
                    .groupby(["e", "w"], sort=False)["v"]
                    .agg(["size", "sum", "count"])
                )
                for (e, w), row in agg.iterrows():
                    s = self.open.get((e, w))
                    if s is None:
                        self.open[(e, w)] = [
                            int(row["size"]), row["sum"], int(row["count"])
                        ]
                    else:
                        s[0] += int(row["size"])
                        s[1] += row["sum"]
                        s[2] += int(row["count"])
                m = int(ts.max())
                self.max_ts = m if self.max_ts is None else max(
                    self.max_ts, m
                )
        return self._close()

    def flush(self) -> pd.DataFrame:
        """End of stream: close every remaining window."""
        return self._emit(sorted(self.open.keys()))

    # -- internals ----------------------------------------------------------

    def _close(self) -> pd.DataFrame:
        if self.max_ts is None:
            return self._emit([])
        watermark = self.max_ts - self.late_us
        closable_end = watermark // self.w_us  # windows with end <= watermark
        keys = sorted(k for k in self.open if k[1] < closable_end)
        # no clamp to 0: pre-epoch timestamps give NEGATIVE window ids and
        # must not be marked closed by the first watermark
        self.closed_below = (
            int(closable_end)
            if self.closed_below is None
            else max(self.closed_below, int(closable_end))
        )
        return self._emit(keys)

    def _emit(self, keys) -> pd.DataFrame:
        rows = []
        for k in keys:
            n, s, c = self.open.pop(k)
            sum_v = np.nan if c == 0 else s
            if self.round_digits is not None and not np.isnan(sum_v):
                sum_v = round(sum_v, self.round_digits)
            rows.append((k[0], int(k[1]) * self.w_us, n, sum_v))
        self.emitted += len(rows)
        out = pd.DataFrame(
            rows,
            columns=[self.entity_col, "window_start", "n_events", "sum_value"],
        )
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].astype("float64")
        return out


class SessionWindowState:
    """Incremental gap-based session windows with watermark closing — the
    session-window counterpart of ``TumblingWindowState`` (Flink-style
    merging session windows).

    Per entity the state holds a SORTED list of open sessions
    ``[start, last, n, vsum, vcnt]``; a micro-batch's rows are first
    collapsed vectorized into per-entity mini-sessions (the batch
    ``sessionize`` gap split), then merged into the open list, fusing
    sessions a row bridges. A session EMITS exactly once, when the
    watermark (max_ts − allowed_lateness) passes ``last + gap`` — no
    in-time row can extend it after that (any ts ≥ watermark is > last +
    gap by construction, and older arrivals fall to the late rule). After
    emitting, ``closed_until[entity] = end + gap``: a later arrival at or
    under that boundary would have extended the emitted session, so it is
    DROPPED and counted (``dropped_late``); older-than-watermark rows
    beyond the boundary belong to strictly newer sessions and are merged
    normally. Closability is monotone over the sorted list (a later
    session closable ⇒ every earlier one is), so emission is a prefix pop
    and per-entity session ids stay in start order (0-based, matching
    batch ``session_stats``).

    State size: O(entities × open sessions) — bounded by gap/lateness
    over the event-time span in flight, never by stream length.
    """

    def __init__(
        self,
        *,
        entity_col: str,
        ts_col: str,
        gap,
        value_col: str | None = None,
        allowed_lateness=0,
        round_digits: int | None = 6,
    ):
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.gap_us = _window_us(gap)
        self.late_us = _window_us(allowed_lateness) if allowed_lateness else 0
        self.round_digits = round_digits
        self.open: dict = {}  # entity -> [[start, last, n, vsum, vcnt], ...]
        self.next_sid: dict = {}
        self.closed_until: dict = {}
        self.max_ts = None
        self.dropped_late = 0
        self.emitted = 0

    def process(self, batch: pd.DataFrame | pa.Table) -> pd.DataFrame:
        if isinstance(batch, pa.Table):
            batch = batch.to_pandas()
        if len(batch):
            df = batch.sort_values(
                [self.entity_col, self.ts_col], kind="stable"
            )
            ts = _ts_us(df[self.ts_col])
            ents = df[self.entity_col].to_numpy()
            vals = (
                df[self.value_col].to_numpy(dtype=np.float64, na_value=np.nan)
                if self.value_col is not None
                else np.zeros(len(df))
            )
            new_ent = np.concatenate(([True], ents[1:] != ents[:-1]))
            e_starts = np.flatnonzero(new_ent)
            e_bounds = np.append(e_starts, len(df))
            for i0, i1 in zip(e_bounds[:-1], e_bounds[1:]):
                e = ents[i0]
                ets, evs = ts[i0:i1], vals[i0:i1]
                cu = self.closed_until.get(e)
                if cu is not None:
                    late = ets <= cu
                    if late.any():
                        self.dropped_late += int(late.sum())
                        ets, evs = ets[~late], evs[~late]
                if not len(ets):
                    continue
                # vectorized gap split into mini-sessions
                brk = np.flatnonzero(np.diff(ets) > self.gap_us) + 1
                b = np.concatenate(([0], brk, [len(ets)]))
                minis = []
                for j0, j1 in zip(b[:-1], b[1:]):
                    seg = evs[j0:j1]
                    valid = ~np.isnan(seg)
                    minis.append(
                        [int(ets[j0]), int(ets[j1 - 1]), int(j1 - j0),
                         float(seg[valid].sum()), int(valid.sum())]
                    )
                # merge into the open list, fusing bridged sessions
                merged = []
                for s in sorted(self.open.get(e, []) + minis):
                    if merged and s[0] <= merged[-1][1] + self.gap_us:
                        m = merged[-1]
                        m[1] = max(m[1], s[1])
                        m[2] += s[2]
                        m[3] += s[3]
                        m[4] += s[4]
                    else:
                        merged.append(s)
                self.open[e] = merged
            m = int(ts.max())
            self.max_ts = m if self.max_ts is None else max(self.max_ts, m)
        return self._close()

    def flush(self) -> pd.DataFrame:
        rows = []
        for e in sorted(self.open):
            for s in self.open[e]:
                rows.append(self._emit_row(e, s))
        self.open.clear()
        return self._frame(rows)

    # -- internals ----------------------------------------------------------

    def _close(self) -> pd.DataFrame:
        if self.max_ts is None:
            return self._frame([])
        watermark = self.max_ts - self.late_us
        rows = []
        for e in sorted(self.open):
            sess = self.open[e]
            k = 0
            while k < len(sess) and sess[k][1] + self.gap_us < watermark:
                rows.append(self._emit_row(e, sess[k]))
                k += 1
            if k:
                self.open[e] = sess[k:]
        return self._frame(rows)

    def _emit_row(self, e, s):
        sid = self.next_sid.get(e, 0)
        self.next_sid[e] = sid + 1
        self.closed_until[e] = max(
            self.closed_until.get(e, s[1] + self.gap_us),
            s[1] + self.gap_us,
        )
        self.emitted += 1
        sum_v = np.nan if s[4] == 0 else s[3]
        if self.round_digits is not None and not np.isnan(sum_v):
            sum_v = round(sum_v, self.round_digits)
        return (e, sid, s[2], s[0], s[1], (s[1] - s[0]) / 1_000_000.0, sum_v)

    def _frame(self, rows) -> pd.DataFrame:
        out = pd.DataFrame(
            rows,
            columns=[self.entity_col, "session_id", "n_events", "start_ts",
                     "end_ts", "duration_sec", "sum_value"],
        )
        out["session_id"] = out["session_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["start_ts"] = out["start_ts"].astype("datetime64[us]")
        out["end_ts"] = out["end_ts"].astype("datetime64[us]")
        out["duration_sec"] = out["duration_sec"].astype("float64")
        out["sum_value"] = out["sum_value"].astype("float64")
        if self.value_col is None:
            out = out.drop(columns=["sum_value"])
        return out


def streaming_sessionize(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    gap,
    value_col: str | None = None,
    allowed_lateness=0,
    micro_batch_rows: int = 4096,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed replay of the session-window machine: one entity-hash
    exchange, each bucket feeds its rows in event-time order through
    ``SessionWindowState`` in micro-batch slices + a final flush. On
    in-order replay nothing is late and the output equals batch
    ``session_stats`` (the oracle), session ids included."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(ts_col, kind="stable")
        state = SessionWindowState(
            entity_col=entity_col, ts_col=ts_col, gap=gap,
            value_col=value_col, allowed_lateness=allowed_lateness,
            round_digits=round_digits,
        )
        outs = []
        for i in range(0, len(df), micro_batch_rows):
            outs.append(state.process(df.iloc[i:i + micro_batch_rows]))
        outs.append(state.flush())
        assert state.dropped_late == 0  # in-order replay can't be late
        return pd.concat(outs, ignore_index=True)

    bucketed = add_bucket_column(ds, entity_col, num_buckets)
    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def streaming_tumbling(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    width,
    allowed_lateness=0,
    micro_batch_rows: int = 4096,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed replay of the streaming window machine: one entity-hash
    exchange, then each bucket feeds its rows in EVENT-TIME order through
    ``TumblingWindowState`` in ``micro_batch_rows`` slices + a final flush.
    Equal to ``tumbling_aggregate`` by construction on in-order replay
    (the oracle); the point is exercising the exactly-once watermark
    emission path distributed, per bucket.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(ts_col, kind="stable")
        state = TumblingWindowState(
            entity_col=entity_col, ts_col=ts_col, value_col=value_col,
            width=width, allowed_lateness=allowed_lateness,
            round_digits=round_digits,
        )
        outs = []
        for i in range(0, len(df), micro_batch_rows):
            outs.append(state.process(df.iloc[i:i + micro_batch_rows]))
        outs.append(state.flush())
        assert state.dropped_late == 0  # in-order replay can't be late
        return pd.concat(outs, ignore_index=True)

    bucketed = add_bucket_column(ds, entity_col, num_buckets)
    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


class StreamingDedupState:
    """Exact streaming dedup: fold micro-batches with ``update`` — each
    call returns ONLY the rows whose key has never been seen (first
    occurrence in arrival order wins, within and across batches). Exact
    for an unbounded stream at O(distinct keys) state; shard the stream
    by hash(key) so each consumer actor holds only its own keys (the
    engine's replay wrapper below does exactly that), and reach for the
    bloom/decayed variants when memory must be bounded instead.
    """

    def __init__(self, key_col: str):
        self.key_col = key_col
        self.seen: set = set()

    def update(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = pd.Series(t[self.key_col].to_numpy(zero_copy_only=False))
        first_in_batch = ~keys.duplicated(keep="first")
        unseen = ~keys.isin(self.seen)
        emit = (first_in_batch & unseen).to_numpy()
        self.seen.update(keys[emit].tolist())
        return t.take(np.flatnonzero(emit))


def streaming_dedup(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    order_cols: list[str],
    micro_batch_rows: int = 512,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed replay of :class:`StreamingDedupState`: partition the
    stream by hash(key) (a key's duplicates all reach the same state),
    replay each bucket in ``order_cols`` order through the fold in
    ``micro_batch_rows`` chunks, and emit the first-seen rows. On
    in-order replay the result equals the batch "first row per key by
    (order_cols)" — which is the SQL oracle; the state itself handles
    arbitrary arrival orders (late duplicates are suppressed either way,
    pytest-gated).
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    bucketed = add_bucket_column(ds, key_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            order_cols, kind="stable")
        state = StreamingDedupState(key_col)
        out = []
        t = pa.Table.from_pandas(df, preserve_index=False)
        for lo in range(0, t.num_rows, micro_batch_rows):
            emitted = state.update(t.slice(lo, micro_batch_rows))
            if emitted.num_rows:
                out.append(emitted)
        if not out:
            return df.iloc[:0]
        return pa.concat_tables(out).to_pandas()

    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


class StreamingAsofState:
    """Streaming point-in-time enrich: fold an interleaved stream of
    FEATURE rows and SPINE rows (tagged by ``side_col``: 1 = spine) in
    event-time order; each ``update`` returns the batch's spine rows
    with the latest feature value at-or-before their ts (equal-ts
    features match; equal-ts feature ties take the max tiebreak — the
    house as-of rule). State = one (ts, tiebreak, value) per entity,
    O(entities); requires in-order folding (use a watermark buffer
    upstream for out-of-order streams — ``lateness_audit`` sizes it).
    """

    def __init__(self, entity_col: str, ts_col: str, value_col: str,
                 side_col: str, tiebreak: str):
        self.e, self.t, self.v = entity_col, ts_col, value_col
        self.side, self.tb = side_col, tiebreak
        self.carry: pd.DataFrame | None = None  # typed lazily from data

    def update(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([self.t, self.tb], kind="stable")
        is_spine = df[self.side].to_numpy() == 1
        fb = df.loc[~is_spine, [self.e, self.t, self.tb, self.v]]
        sb = df.loc[is_spine]
        feats = fb if self.carry is None else pd.concat(
            [self.carry, fb], ignore_index=True)
        feats = feats.sort_values([self.t, self.tb], kind="stable")
        out = sb.drop(columns=[self.side])
        if feats.empty:
            out[f"{self.v}_asof"] = np.nan
        else:
            # merge_asof backward takes the LAST row with ts <= key in
            # sort order; (ts, tiebreak) sort makes that max-tiebreak
            m = pd.merge_asof(
                out.sort_values(self.t, kind="stable"),
                feats.rename(columns={self.v: f"{self.v}_asof"})[
                    [self.e, self.t, f"{self.v}_asof"]],
                on=self.t, by=self.e, direction="backward",
                allow_exact_matches=True,
            )
            out = m
        if not feats.empty:
            self.carry = (
                feats.groupby(self.e, sort=False).tail(1)
                .reset_index(drop=True)
            )
        return out


def streaming_asof(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    spine_type,
    type_col: str = "event_type",
    feature_type=None,
    micro_batch_rows: int = 512,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed replay of :class:`StreamingAsofState`: partition the
    interleaved stream by hash(entity), replay each bucket in (ts,
    tiebreak) order through the fold in micro-batches. On in-order
    replay the result equals the batch as-of join (the SQL oracle);
    the state is the thing a long-running enrich service would hold.
    ``spine_type`` rows are enriched; ``feature_type`` rows (default:
    everything else) feed the state.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    bucketed = add_bucket_column(ds, entity_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df.dropna(subset=[entity_col, ts_col])
        side = (df[type_col] == spine_type).astype(np.int8)
        if feature_type is not None:
            keep = (side == 1) | (df[type_col] == feature_type)
            df, side = df[keep.to_numpy()], side[keep.to_numpy()]
        df = df.assign(_side=side).sort_values(
            [ts_col, tiebreak], kind="stable")
        state = StreamingAsofState(
            entity_col, ts_col, value_col, "_side", tiebreak)
        out = []
        for lo in range(0, len(df), micro_batch_rows):
            emitted = state.update(df.iloc[lo:lo + micro_batch_rows])
            if len(emitted):
                out.append(emitted)
        if not out:
            e = df.iloc[:0].drop(columns=["_side"])
            e[f"{value_col}_asof"] = pd.Series(dtype="float64")
            return e
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def lateness_audit(
    ds: ray.data.Dataset,
    *,
    order_col: str,
    ts_col: str,
    delays,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Watermark-tuning audit: for each candidate allowed-lateness
    ``d``, how many events would be dropped by a watermark trailing the
    max event time seen so far in ARRIVAL order (``order_col``) by
    ``d`` — i.e. rows where ``wm_prev − ts > d`` with ``wm_prev`` the
    running max of ``ts`` over STRICTLY EARLIER arrivals (the event is
    judged against the watermark as it stood when the event arrived; the
    first arrival is never late). One row per delay:
    (delay_s, n_late, n_total, late_frac). All comparisons are integer
    microseconds — exact on both sides. Null order/ts rows are excluded.

    Scale shape (the carry-scan pattern): arrival ids are RANGE-bucketed
    (``order // chunk``, chunk sized off one cheap max(order) pass so
    buckets ≈ num_buckets); each bucket computes its shifted running max
    and its own max-ts partial in one pass; the driver prefix-maxes the
    num_buckets-sized partials into per-bucket carries; a second pass
    folds the carry in and emits per-delay count partials. Rows never
    leave their bucket; the driver sees only (bucket, max_ts) and
    (delay, count) partials.
    """
    import pyarrow.compute as pc

    from featherstore_ray.stages.window import _window_us

    d_us = np.array(sorted(_window_us(d) for d in delays), dtype=np.int64)
    d_s = (d_us // 1_000_000).astype(np.int64)

    proj = ds.select_columns([order_col, ts_col]).map_batches(
        lambda t: t.drop_null(), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # pass 0: max(order) -> chunk size (one tiny aggregate)
    mx = proj.max(order_col)
    if mx is None:
        return ray.data.from_arrow(pa.table({
            "delay_s": pa.array(d_s),
            "n_late": pa.array(np.zeros(len(d_s), dtype=np.int64)),
            "n_total": pa.array(np.zeros(len(d_s), dtype=np.int64)),
            "late_frac": pa.array(np.full(len(d_s), np.nan)),
        }))
    chunk = max(1, (int(mx) + num_buckets) // num_buckets)

    def assign(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            BUCKET_COL, pa.array((o // chunk).astype(np.int32)))

    bucketed = proj.map_batches(
        assign, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # pass 1: per-bucket max ts partial (order-independent)
    def bmax(t: pa.Table) -> pa.Table:
        b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"b": b, "t": ts})
        g = df.groupby("b", sort=True)["t"].max()
        return pa.table({"b": pa.array(g.index.to_numpy(dtype=np.int32)),
                         "t": pa.array(g.to_numpy())})

    parts = bucketed.map_batches(
        bmax, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    bm = parts.groupby("b", sort=True)["t"].max()
    # exclusive prefix max carried INTO each bucket
    carry_idx = bm.index.to_numpy()
    # sentinel is int64_min // 4, NOT int64_min: wm_prev - ts on the
    # first-ever arrival must not wrap int64 (ts ~ 1.7e15 us)
    sent = np.iinfo(np.int64).min // 4
    carry_val = np.concatenate((
        [sent], np.maximum.accumulate(bm.to_numpy())[:-1]))
    carry = {int(b): int(v) for b, v in zip(carry_idx, carry_val)}

    # pass 2: per-bucket shifted running max + carry -> per-delay counts
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        d = df.sort_values(order_col, kind="stable")
        ts = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        run = np.maximum.accumulate(ts)
        wm_prev = np.empty(len(ts), dtype=np.int64)
        wm_prev[0] = carry.get(b, np.iinfo(np.int64).min // 4)
        if len(ts) > 1:
            wm_prev[1:] = np.maximum(run[:-1], wm_prev[0])
        late = wm_prev - ts  # int64 us; first-ever row: huge negative
        n_late = np.array([(late > du).sum() for du in d_us],
                          dtype=np.int64)
        return pd.DataFrame({
            "delay_s": d_s, "n_late": n_late,
            "n_total": np.full(len(d_s), len(ts), dtype=np.int64),
        })

    counts = bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    agg = counts.groupby("delay_s", sort=True)[["n_late", "n_total"]] \
        .sum().reset_index()
    frac = np.round(
        agg["n_late"].to_numpy(dtype=np.float64)
        / agg["n_total"].to_numpy(dtype=np.float64), 6)
    return ray.data.from_arrow(pa.table({
        "delay_s": pa.array(agg["delay_s"].to_numpy(dtype=np.int64)),
        "n_late": pa.array(agg["n_late"].to_numpy(dtype=np.int64)),
        "n_total": pa.array(agg["n_total"].to_numpy(dtype=np.int64)),
        "late_frac": pa.array(frac),
    }))
