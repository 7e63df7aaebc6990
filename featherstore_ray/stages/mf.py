"""Matrix factorization: exact rank-1 alternating least squares.

The collaborative-filtering training primitive: factor the observed
(user, item, rating) matrix as ``r_ij ≈ u_i · v_j``. At rank 1 every ALS
half-step has the closed form ``u_i = Σ_j r_ij·v_j / Σ_j v_j²`` (over user
i's observed pairs), then symmetrically for items — which keeps the whole
iteration SQL-expressible, so the op is fully oracled (unrolled CTE
chain), unlike black-box factorization trainers.

Reference parity note: no factorization exists in the reference; this
extends the engine toward recsys training-data pipelines alongside
negative_sampling / item_similarity / hard_negatives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def als_rank1(
    ds: ray.data.Dataset,
    user_col: str,
    item_col: str,
    value_col: str,
    *,
    iters: int = 3,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Rank-1 ALS over the observed (user, item, value) triples: item
    factors init at 1.0, then ``iters`` full (user-step, item-step)
    rounds of the exact least-squares updates. Rows with a null user,
    item or value are excluded on both sides. Output: one row per
    distinct user and per distinct item — (kind, entity, factor) with
    ``entity`` the key cast to string so both sides union, ``factor``
    rounded.

    Scale shape: rows bucket-exchange on hash(user) ONCE and the bucketed
    table materializes; each iteration is a per-bucket kernel (users are
    complete inside their bucket, so ``u_i`` is exact) that emits
    (item, Σr·u, Σu²) partials — the exchange carries distinct items,
    never rows — merged driver-side over the item-bounded table (item
    catalogs are broadcastable by recsys contract; the user side is
    unbounded and never leaves its bucket). k iterations = k streaming
    passes over the same materialized buckets, no re-shuffle.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    cols = [user_col, item_col, value_col]

    def drop_nulls(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_valid(t[user_col])
        for c in (item_col, value_col):
            mask = pc.and_(mask, pc.is_valid(t[c]))
        return t.select(cols).filter(mask)

    tagged = add_bucket_column(
        ds.map_batches(drop_nulls, batch_size=None, batch_format="pyarrow",
                       zero_copy_batch=True),
        user_col, num_buckets,
    ).materialize()

    # item vocabulary (sorted, bounded by contract) from count partials
    def item_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({item_col: pc.unique(t[item_col])})

    items = np.sort(
        tagged.map_batches(item_partial, batch_size=None,
                           batch_format="pyarrow")
        .to_pandas()[item_col].unique()
    )
    n_items = len(items)
    if n_items == 0:
        return ray.data.from_arrow(pa.table({
            "kind": pa.array([], pa.string()),
            "entity": pa.array([], pa.string()),
            "factor": pa.array([], pa.float64()),
        }))

    def make_pass(v_factors: np.ndarray, emit_users: bool):
        """One ALS user-step per bucket; emits item partials or the
        final per-user factors. Library names bind as closure defaults
        (worker-shipped code must not import the engine at runtime)."""
        items_ = items

        def kernel(t: pa.Table, _items=items_, _v=v_factors,
                   _emit=emit_users) -> pa.Table:
            t = t.drop_columns([BUCKET_COL])
            u_keys = pd.Series(t[user_col].to_numpy(zero_copy_only=False))
            i_idx = np.searchsorted(
                _items, t[item_col].to_numpy(zero_copy_only=False))
            r = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = _v[i_idx]
            ucodes, uuniq = pd.factorize(u_keys, sort=True)
            num = np.bincount(ucodes, weights=r * v, minlength=len(uuniq))
            den = np.bincount(ucodes, weights=v * v, minlength=len(uuniq))
            u_per_user = num / den
            if _emit:
                return pa.table({
                    "kind": pa.array(["user"] * len(uuniq)),
                    "entity": pa.array([str(x) for x in uuniq]),
                    "factor": pa.array(np.round(u_per_user, round_digits)),
                })
            u_row = u_per_user[ucodes]
            s1 = np.bincount(i_idx, weights=r * u_row, minlength=len(_items))
            s2 = np.bincount(i_idx, weights=u_row * u_row,
                             minlength=len(_items))
            return pa.table({
                "_i": pa.array(np.arange(len(_items), dtype=np.int64)),
                "_s1": pa.array(s1),
                "_s2": pa.array(s2),
            })

        return kernel

    v = np.ones(n_items, dtype=np.float64)
    for _ in range(int(iters)):
        parts = bucketed_map_groups(
            tagged, make_pass(v, emit_users=False),
            num_buckets=num_buckets, batch_format="pyarrow",
        ).to_pandas()
        m = parts.groupby("_i", sort=True)[["_s1", "_s2"]].sum()
        s1 = np.zeros(n_items)
        s2 = np.zeros(n_items)
        s1[m.index.to_numpy()] = m["_s1"].to_numpy()
        s2[m.index.to_numpy()] = m["_s2"].to_numpy()
        v = s1 / s2  # every observed item has s2 > 0

    users_out = bucketed_map_groups(
        tagged, make_pass(v, emit_users=True),
        num_buckets=num_buckets, batch_format="pyarrow",
    )
    items_out = ray.data.from_arrow(pa.table({
        "kind": pa.array(["item"] * n_items),
        "entity": pa.array([str(x) for x in items]),
        "factor": pa.array(np.round(v, round_digits)),
    }))
    return users_out.union(items_out)
