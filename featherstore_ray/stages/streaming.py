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
