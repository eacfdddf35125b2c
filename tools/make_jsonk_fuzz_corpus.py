#!/usr/bin/env python3
"""Build the adversarial props.k fuzz corpus: a copy of an sf directory
whose events table gains rows where `$.k` is present but NOT a plain
integer — the exact class behind the q376/q392 oracle-parity bugs (a
Spark `cast(get_json_object(..) as long)` yields NULL and the row drops;
a DuckDB oracle filtering on RAW json presence kept it).

Adversarial shapes appended per existing event_type:
  - {"k": "abc"}   present, non-numeric string  -> out of scope BOTH sides
  - {"k": null}    present, JSON null           -> out of scope BOTH sides
  - {}             absent                       -> out of scope BOTH sides
  - {"k": "17"}    quoted NUMERIC string        -> IN scope BOTH sides (=17)
  - {"k": 49}/{"k": 50}  boundary integers around the k<50 share gates

Out of contract (documented, not generated): float and boolean k — the
engines legitimately disagree there (Spark string->long truncates "4.9"
to 4 while DuckDB rounds JSON 4.9 to 5), and the generator never emits
them.

Usage: python3 tools/make_jsonk_fuzz_corpus.py <srcSfDir> <dstDir>
Then:  run Verify with the json-k prefixes and tools/local_verify.py on
the result (see FIXTURES.md). (Driver-side tooling only.)
"""
import os
import shutil
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ADVERSARIAL_PROPS = ['{"k": "abc"}', '{"k": null}', '{}', '{"k": "17"}',
                     '{"k": 49}', '{"k": 50}']


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if t != "events" and os.path.exists(p):
            shutil.copyfile(p, f"{dst}/{t}.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM '{src}/events.parquet'")
    # One adversarial row per (event_type, shape), ids continuing the
    # existing sequence, timestamps/users/values cycled deterministically
    # from per-type medians so every other column stays in-domain.
    shapes = ", ".join(f"({i}, '{p.replace(chr(39), chr(39)*2)}')"
                       for i, p in enumerate(ADVERSARIAL_PROPS))
    con.execute(f"""
      COPY (
        WITH base AS (SELECT max(event_id) AS mx FROM ev),
        types AS (
          SELECT event_type,
                 min(user_id) AS user_id,
                 min(ts) + INTERVAL 1 DAY AS ts,
                 round(median(value), 2) AS value,
                 row_number() OVER (ORDER BY event_type) - 1 AS tix
          FROM ev GROUP BY event_type),
        adv AS (
          SELECT (base.mx + 1 + tix * {len(ADVERSARIAL_PROPS)} + s.i)::BIGINT
                   AS event_id,
                 t.ts, t.user_id, t.event_type, t.value, s.props
          FROM types t CROSS JOIN base
          CROSS JOIN (VALUES {shapes}) s(i, props))
        SELECT event_id, ts, user_id, event_type, value, props FROM ev
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value, props FROM adv
        ORDER BY event_id
      ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(
        f"SELECT count(*) FROM '{dst}/events.parquet'").fetchone()[0]
    print(f"wrote {dst}/events.parquet ({n} rows, "
          f"{len(ADVERSARIAL_PROPS)} adversarial shapes per type)")


if __name__ == "__main__":
    main()
