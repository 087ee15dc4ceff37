#!/usr/bin/env python3
"""Tractable ev_geo_dbscan oracle: DuckDB pair generation + union-find.

The registered ev_geo_dbscan oracle labels core clusters with a
RECURSIVE transitive-closure CTE (`reach`), which materializes
|component|^2 rows. At sf0.01 that is instant; on the 10x fixture the
point density makes one near-global component (~15k nodes, ~10^5
edges), so the closure is ~10^8 dedup'd rows re-joined every
iteration — hours of DuckDB time, the one row the round-9 full sweep
could not finish. The closure's OUTPUT, though, is just
component-min labeling, which union-find computes in O(E α(E)).

This tool re-derives everything up to the closure with the SAME SQL
text as the registered oracle (grid CTEs, pair predicate, neighbor
counts, core test, border attachment are copied verbatim from
SparkEntry.oracleSql — only `reach`+`cl` are replaced by union-find),
then compares the final (user_id, role, cluster_id) rows against the
Spark dump exactly like check_oracle.py (sorted columns, emitted rows).

Validate the replacement itself at a small sf first (both this tool
and check_oracle.py green on the same dump), then run it at scale:

  tools/dbscan_oracle.py /root/testdata/sf0.01 /tmp/verify_small
  tools/dbscan_oracle.py /tmp/graft_sf1u_flat /tmp/verify_sf1
"""
import sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(t)[:-8]} AS SELECT * FROM '{t}'")

# Verbatim from SparkEntry.geoGridCtes + the ev_geo_dbscan oracle's
# pr/und/nc/core/ce CTEs (eps^2 = 2304, minPts = 3, cell = 64).
PRE = """WITH
u AS (SELECT DISTINCT user_id FROM events),
p AS (SELECT user_id,
    ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':17'), 1, 8))::BIGINT % 1024 AS x,
    ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':23'), 1, 8))::BIGINT % 1024 AS y
  FROM u),
c AS (SELECT user_id, x, y, x // 64 AS cx, y // 64 AS cy FROM p),
n AS (SELECT user_id, x, y, cx + dx.d AS ncx, cy + dy.d AS ncy
  FROM c, (SELECT unnest([-1, 0, 1]) AS d) dx, (SELECT unnest([-1, 0, 1]) AS d) dy),
pr AS (SELECT a.user_id AS id_a, b.user_id AS id_b
  FROM n a JOIN c b ON a.ncx = b.cx AND a.ncy = b.cy AND a.user_id < b.user_id
  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2304),
und AS (SELECT id_a AS id, id_b AS nb FROM pr
        UNION ALL SELECT id_b, id_a FROM pr),
nc AS (SELECT id, count(*) AS nn FROM und GROUP BY id),
core AS (SELECT u.user_id AS id FROM u LEFT JOIN nc ON nc.id = u.user_id
         WHERE COALESCE(nn, 0) + 1 >= 3)
"""

users = [r[0] for r in con.execute(PRE + "SELECT user_id FROM u ORDER BY user_id").fetchall()]
core = set(r[0] for r in con.execute(PRE + "SELECT id FROM core").fetchall())
pairs = con.execute(PRE + "SELECT id_a, id_b FROM pr").fetchall()
print(f"users={len(users)} core={len(core)} pairs={len(pairs)}", flush=True)

# union-find over core-core edges == component-min of the oracle's
# reach/cl CTEs (min over the full closure IS the component minimum;
# an isolated core keeps its own id via the COALESCE in corelab)
parent = {}
def find(a):
    r = a
    while parent[r] != r:
        r = parent[r]
    while parent[a] != r:
        parent[a], a = r, parent[a]
    return r
for i in core:
    parent[i] = i
for a, b in pairs:
    if a in core and b in core:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
corelab = {i: find(i) for i in core}

# border attachment: min core-neighbor label over BOTH pair directions
ba = {}
for a, b in pairs:
    if b in core and a not in core:
        ba[a] = min(ba.get(a, corelab[b]), corelab[b])
    if a in core and b not in core:
        ba[b] = min(ba.get(b, corelab[a]), corelab[a])

rows = []
for uid in users:
    if uid in core:
        rows.append((uid, "core", corelab[uid]))
    elif uid in ba:
        rows.append((uid, "border", ba[uid]))
    else:
        rows.append((uid, "noise", None))

spark = con.execute(
    f"SELECT user_id, role, cluster_id FROM '{out}/ev_geo_dbscan/*.parquet' "
    "ORDER BY user_id").fetchall()
if len(spark) != len(rows):
    print(f"FAIL rows: spark={len(spark)} oracle={len(rows)}")
    sys.exit(1)
bad = [(s, o) for s, o in zip(spark, rows) if tuple(s) != o]
if bad:
    print(f"FAIL values: {len(bad)} mismatched rows; first 5: {bad[:5]}")
    sys.exit(1)
from collections import Counter
print(f"OK ev_geo_dbscan: {len(rows)} rows exact; roles={dict(Counter(r[1] for r in rows))}, "
      f"clusters={len(set(r[2] for r in rows if r[2] is not None))}")
