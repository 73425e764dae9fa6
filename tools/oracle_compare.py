#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_compare.py [sfDir] [voutDir] [--tolerant]
Compares each /tmp/vout/<name>/*.parquet against its oracle SQL run in
DuckDB over the sfDir parquet tables; prints per-query MATCH / MISMATCH.

Floats compare BIT-EXACT (IEEE-754 struct pack) by default — the driver
hashes exact values, so the local pre-flight gate must be at least as
strict. `--tolerant` restores the old round-to-6-digits compare for
DIAGNOSIS ONLY (to tell "one ulp off" from "wrong answer"); a tolerant
MATCH is never shippable evidence.

Column TYPES compare too (VERDICT r4 #2): the driver's hash is
type-aware, so a DuckDB HUGEINT (int128 — e.g. an uncast sum()) against
a Spark BIGINT is a driver MISMATCH even when every value is numerically
identical (the exact r4 p_mixture / p_sessions failure). The gate
compares the DuckDB-reported type of every column of the Spark parquet
against the oracle relation's type, name-sorted like the row canon.

Calibrated against CORRECTNESS_r04.json: the driver hash tolerates
in-family integer WIDTH up to 64 bits (p_pii_scan et al. ship Spark INT
vs oracle BIGINT and are driver-green) but NOT the 128-bit HUGEINT that
an uncast DuckDB sum() produces (p_mixture/p_sessions were driver-red on
exactly that). So TINYINT..BIGINT normalize to one INT64 class; HUGEINT
and everything else stay distinct.
"""
import duckdb, json, sys, decimal, struct

args = [a for a in sys.argv[1:] if a != '--tolerant']
TOLERANT = '--tolerant' in sys.argv[1:]
sf = args[0] if len(args) > 0 else '/root/testdata/sf0.01'
vout = args[1] if len(args) > 1 else '/tmp/vout'

con = duckdb.connect()
for t in ['documents', 'lineitem', 'orders', 'customer', 'nation', 'region',
          'supplier', 'part', 'events', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if TOLERANT:
            return round(v, 6)
        # bit-exact: two floats are equal iff their IEEE-754 bits are
        # (treats -0.0 != 0.0 and distinguishes ulps, like a hash would)
        return ('f64', struct.pack('<d', v))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

oracle = json.load(open(f'{vout}/oracle_sql.json'))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        srel = con.sql(f"SELECT * FROM '{vout}/{name}/*.parquet'")
        scols = list(srel.columns)
        stypes = [str(t) for t in srel.types]
        srows = srel.fetchall()
        orel = con.sql(sql)
        ocols = list(orel.columns)
        otypes = [str(t) for t in orel.types]
        orows = orel.fetchall()
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails += 1
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    # name-sorted type vectors, same order as the row canon
    def tnorm(t):
        return 'INT64' if t in ('TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT') else t
    st = [tnorm(stypes[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])]
    ot = [tnorm(otypes[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])]
    if sc != oc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
        fails += 1
    elif st != ot:
        tdiff = [(c, a, b) for c, a, b in zip(sc, st, ot) if a != b]
        print(f"{name}: TYPE MISMATCH {tdiff}")
        fails += 1
    elif sr != orr:
        diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        print(f"{name}: ROW MISMATCH rows spark={len(sr)} oracle={len(orr)} first_diffs={diff}")
        fails += 1
    else:
        tag = ' [tolerant]' if TOLERANT else ''
        print(f"{name}: MATCH ({len(sr)} rows){tag}")
no_oracle = [d for d in __import__('os').listdir(vout)
             if d != 'oracle_sql.json' and d not in oracle]
for d in sorted(no_oracle):
    print(f"{d}: no_oracle")
sys.exit(1 if fails else 0)
