#!/usr/bin/env python3
"""Write a perturbed copy of a testdata SF dir for correct-on-any-data
sweeps (driver-side dev tool; pairs with graft.Verify + check_oracle.py).

Modes (comma-separable; application order is FIXED by the code —
drop9, dup10, skew, vintage, nulls, with `reverse` flipping the final
row order — regardless of the order given on the command line. The
fixed order is load-bearing: skew picks its hot user BEFORE nulls
injects NULL user_ids, else the NULL pseudo-group could win the
busiest-user argmax and `user_id = NULL` would match nothing, silently
turning the skew mode into a no-op):
  drop9    - drop every 9th row of every table (id gaps, sparse ids)
  dup10    - re-append 10% of documents/embeddings under fresh ids and
             redeliver 5% of events (crawl-dup / at-least-once shape)
  skew     - replicate the single busiest user's events 19 extra times
             under fresh event_ids (one ~20x hot key: the user-window,
             session and stream state paths under heavy key skew)
  vintage  - rewrite events.ts as raw int64 NANOSECONDS (the old
             generator vintage; Tables.normalizedTs must absorb it —
             applied alone, Spark-side row hashes must equal pristine)
  nulls    - NULL out ~3% of events.user_id, ~2.5% of events.value and
             ~2% of documents.lang (NULL-semantics divergence sweep:
             count vs count(DISTINCT), grouping on NULL keys, null
             arithmetic)
  reverse  - reverse row order per table (order-independence)

Usage: mutate_testdata.py <src_sf_dir> <dst_dir> [modes]
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ID_COL = {"documents": "doc_id", "embeddings": "vec_id"}


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    modes = (sys.argv[3] if len(sys.argv) > 3 else "drop9,reverse").split(",")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        q = f"SELECT *, row_number() OVER () AS __rn FROM read_parquet('{p}')"
        if "drop9" in modes:
            q = f"SELECT * FROM ({q}) WHERE __rn % 9 != 0"
        if "dup10" in modes and t in ("documents", "embeddings"):
            idc = ID_COL[t]
            q = (f"SELECT * FROM ({q}) UNION ALL "
                 f"SELECT * REPLACE (({idc} + (SELECT max({idc}) + 1 FROM "
                 f"read_parquet('{p}'))) AS {idc}, (__rn + 1000000000) AS __rn) "
                 f"FROM ({q}) WHERE __rn % 10 = 0")
        if "dup10" in modes and t == "events":
            q = (f"SELECT * FROM ({q}) UNION ALL SELECT * REPLACE "
                 f"((__rn + 1000000000) AS __rn) FROM ({q}) WHERE __rn % 20 = 0")
        if "skew" in modes and t == "events":
            hot = (f"SELECT user_id FROM ({q}) GROUP BY user_id "
                   f"ORDER BY count(*) DESC, user_id LIMIT 1")
            # offset base 2e9 keeps skew's __rn/event_id spaces disjoint
            # from dup10's +1e9 copies when modes are combined
            q = (f"SELECT * FROM ({q}) UNION ALL "
                 f"SELECT e.* REPLACE ((event_id + 2000000000 * g) AS event_id, "
                 f"(__rn + 2000000000 * g) AS __rn) "
                 f"FROM ({q}) e, range(1, 20) r(g) "
                 f"WHERE user_id = ({hot})")
        if "vintage" in modes and t == "events":
            q = f"SELECT * REPLACE (epoch_ns(ts)::BIGINT AS ts) FROM ({q})"
        if "nulls" in modes and t == "events":
            # deterministic NULL injection into the columns a real event
            # stream leaves nullable: anonymous users (~3%) and events
            # with no monetary value (~2.5%) — the class of divergence
            # the round-15 advice flagged for n_users (count vs
            # count(DISTINCT) NULL semantics)
            q = (f"SELECT * REPLACE ("
                 f"CASE WHEN user_id % 37 = 5 THEN NULL ELSE user_id END"
                 f" AS user_id, "
                 f"CASE WHEN event_id % 41 = 7 THEN NULL ELSE value END"
                 f" AS value) FROM ({q})")
        if "nulls" in modes and t == "documents":
            # untagged-language documents (~2%)
            q = (f"SELECT * REPLACE (CASE WHEN doc_id % 53 = 11 THEN NULL "
                 f"ELSE lang END AS lang) FROM ({q})")
        order = "ORDER BY __rn DESC" if "reverse" in modes else "ORDER BY __rn"
        duckdb.sql(
            f"COPY (SELECT * EXCLUDE (__rn) FROM ({q}) {order}) TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"[mutate] {t}: {n} rows -> {dst}/{t}.parquet")


if __name__ == "__main__":
    main()
