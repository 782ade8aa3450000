# Generates single-statement DuckDB oracle SQLs that bit-exactly mirror the
# graft Spark minhash/simhash dedup pipelines.
U64 = "18446744073709551616::HUGEINT"
B32 = "4294967296::HUGEINT"
P1, P2, P3 = "11400714785074694791::HUGEINT", "14029467366897019727::HUGEINT", "1609587929392839161::HUGEINT"
P4, P5 = "9650029242287828579::HUGEINT", "2870177450012600261::HUGEINT"
C1, C2 = "18397679294719823053::HUGEINT", "14181476777654086739::HUGEINT"
GOLD = "11400714819323198485::HUGEINT"
FNV_P = "1099511628211::HUGEINT"

def mulmod(a, b):
    return (f"(((({a}) >> 32) * {b}) % {B32}) * {B32} + (({a}) % {B32}) * {b}")
def mulmod64(a, b):
    return f"({mulmod(a,b)}) % {U64}"
def x33(c): return f"xor({c}, {c} >> 33)"
def rotl(x, r): return f"((({x}) << {r}) % {U64} + (({x}) >> {64-r}))"
SX = ("CASE WHEN {0} >= 9223372036854775808::HUGEINT "
      "THEN ({0} - {U})::BIGINT ELSE ({0})::BIGINT END").replace("{U}", U64)

# mix64 over column x in successive CTEs: returns list of (suffix, select-expr) stages
def mix64_stages(tag, keys):
    k = ", ".join(keys)
    return [
        f"{tag}a AS (SELECT {k}, {x33('x')} AS x FROM {{prev}})",
        f"{tag}b AS (SELECT {k}, {mulmod64('x', C1)} AS x FROM {tag}a)",
        f"{tag}c AS (SELECT {k}, {x33('x')} AS x FROM {tag}b)",
        f"{tag}d AS (SELECT {k}, {mulmod64('x', C2)} AS x FROM {tag}c)",
        f"{tag}e AS (SELECT {k}, {x33('x')} AS x FROM {tag}d)",
    ]

def chain(stages, prev):
    out = []
    for s in stages:
        out.append(s.replace("{prev}", prev))
        prev = s.split(" AS ")[0].strip()
    return out, prev

# xxhash64 hashLong(v, acc) -> new acc, staged over columns 'acc' and value col v
def hashlong_stages(tag, vcol, keys):
    k = ", ".join(keys)
    return [
        f"{tag}1 AS (SELECT {k}, acc, {mulmod64(vcol, P2)} AS k1a FROM {{prev}})",
        f"{tag}2 AS (SELECT {k}, acc, {mulmod64(rotl('k1a', 31), P1)} AS k1 FROM {tag}1)",
        f"{tag}3 AS (SELECT {k}, xor((acc + {P5} + 8) % {U64}, k1) AS hx FROM {tag}2)",
        f"{tag}4 AS (SELECT {k}, ({mulmod64(rotl('hx', 27), P1)} + {P4}) % {U64} AS h2 FROM {tag}3)",
        f"{tag}5 AS (SELECT {k}, {mulmod64(x33('h2'), P2)} AS f1 FROM {tag}4)",
        f"{tag}6 AS (SELECT {k}, {mulmod64('xor(f1, f1 >> 29)', P3)} AS f2 FROM {tag}5)",
        f"{tag}7 AS (SELECT {k}, xor(f2, f2 >> 32) AS acc FROM {tag}6)",
    ]

def minhash_prelude():
    ctes = [
        """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' near duplicate copy' FROM documents WHERE doc_id % 7 = 0)""",
        """toks AS (
  SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
    ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tk FROM corpus)""",
        """shn AS (
  SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END AS shingles
  FROM toks)""",
        "flat AS (SELECT doc_id, unnest(shingles) AS s FROM shn)",
        f"""hashed AS (
  SELECT DISTINCT doc_id,
    list_reduce(list_prepend(14695981039346656037::HUGEINT,
      list_transform(range(1, len(s)+1), i -> unicode(s[i])::HUGEINT)),
      (h, c) -> ({mulmod('xor(h, c)', FNV_P)}) % {U64}) AS uh
  FROM flat)""",
        f"sd0 AS (SELECT range AS p, ((range + 1)::HUGEINT * {GOLD}) % {U64} AS x FROM range(0, 64))",
    ]
    more, prev = chain(mix64_stages("sd", ["p"]), "sd0")
    ctes += more
    ctes.append(f"seeds AS (SELECT p, x AS seed FROM {prev})")
    ctes.append("pm0 AS (SELECT doc_id, p, xor(uh, seed) AS x FROM hashed CROSS JOIN seeds)")
    more, prev = chain(mix64_stages("pm", ["doc_id", "p"]), "pm0")
    ctes += more
    ctes.append(f"perms AS (SELECT doc_id, p, min({SX.format('x')}) AS sv FROM {prev} GROUP BY doc_id, p)")
    ctes.append("sigs AS (SELECT doc_id, list(sv ORDER BY p) AS sig FROM perms GROUP BY doc_id)")
    # band elements pivoted, then 4 chained hashLong stages
    ctes.append("""bp AS (
  SELECT doc_id, b.range AS band,
    CASE WHEN sig[4*b.range + 1] < 0 THEN sig[4*b.range + 1]::HUGEINT + """ + U64 + """ ELSE sig[4*b.range + 1]::HUGEINT END AS v1,
    CASE WHEN sig[4*b.range + 2] < 0 THEN sig[4*b.range + 2]::HUGEINT + """ + U64 + """ ELSE sig[4*b.range + 2]::HUGEINT END AS v2,
    CASE WHEN sig[4*b.range + 3] < 0 THEN sig[4*b.range + 3]::HUGEINT + """ + U64 + """ ELSE sig[4*b.range + 3]::HUGEINT END AS v3,
    CASE WHEN sig[4*b.range + 4] < 0 THEN sig[4*b.range + 4]::HUGEINT + """ + U64 + """ ELSE sig[4*b.range + 4]::HUGEINT END AS v4
  FROM sigs, range(0, 16) b)""")
    ctes.append("bq0 AS (SELECT doc_id, band, v2, v3, v4, 42::HUGEINT AS acc FROM bp)")
    prev = "bq0"
    for i, vc in enumerate(["v1", "v2", "v3", "v4"]):
        keep = ["doc_id", "band"] + [f"v{j}" for j in range(i + 2, 5)]
        # note: v1 was dropped from bq0's projection, so stage 1 hashes v2? fix: keep v1
        pass
    # redo: keep value columns until consumed
    ctes[-1] = "bq0 AS (SELECT doc_id, band, v1, v2, v3, v4, 42::HUGEINT AS acc FROM bp)"
    prev = "bq0"
    for i, vc in enumerate(["v1", "v2", "v3", "v4"]):
        keep = ["doc_id", "band"] + [f"v{j}" for j in range(i + 2, 5)]
        more, prev = chain(hashlong_stages(f"h{i}", vc, keep), prev)
        ctes += more
    ctes.append(f"bands AS (SELECT doc_id, band, acc AS bh FROM {prev})")
    ctes.append("""buckets AS (
  SELECT band, bh, (list_sort(list(doc_id)))[1:64] AS ids
  FROM bands GROUP BY band, bh HAVING count(*) > 1)""")
    ctes.append("""pairs AS (
  SELECT DISTINCT x.a, y.b2 AS b FROM
    (SELECT band, bh, unnest(ids) AS a FROM buckets) x
    JOIN (SELECT band, bh, unnest(ids) AS b2 FROM buckets) y USING (band, bh)
  WHERE x.a < y.b2)""")
    return ctes

MINHASH_TAIL = """est AS (
  SELECT a, pairs.b,
    len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 64.0 AS est_jaccard
  FROM pairs JOIN sigs sa ON pairs.a = sa.doc_id JOIN sigs sb ON pairs.b = sb.doc_id)
SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY a, b"""

NGRAM_TAIL = """hsets AS (SELECT doc_id, list(uh) AS hs FROM hashed GROUP BY doc_id),
jac AS (
  SELECT a, pairs.b,
    len(list_intersect(sa.hs, sb.hs))::DOUBLE
      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))::DOUBLE AS jaccard
  FROM pairs JOIN hsets sa ON pairs.a = sa.doc_id JOIN hsets sb ON pairs.b = sb.doc_id)
SELECT a, b, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY a, b"""

CLUSTER_MID = """est AS (
  SELECT a, pairs.b,
    len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 64.0 AS ej
  FROM pairs JOIN sigs sa ON pairs.a = sa.doc_id JOIN sigs sb ON pairs.b = sb.doc_id),
edges AS MATERIALIZED (
  SELECT a, b FROM est WHERE ej >= 0.5
  UNION
  SELECT b, a FROM est WHERE ej >= 0.5),
closure AS (
  SELECT a AS id, a AS reach FROM edges
  UNION
  SELECT c.id, e.b AS reach FROM closure c JOIN edges e ON c.reach = e.a),
clusters AS (SELECT id, min(reach) AS cluster_id FROM closure GROUP BY id)"""

CLUSTERS_TAIL = "WITH RECURSIVE__MARK" # handled below

def build(name):
    ctes = minhash_prelude()
    if name == "dedup_minhash":
        return "WITH " + ",\n".join(ctes) + ",\n" + MINHASH_TAIL
    if name == "dedup_ngram_jaccard":
        return "WITH " + ",\n".join(ctes) + ",\n" + NGRAM_TAIL
    if name == "dedup_clusters":
        return ("WITH RECURSIVE " + ",\n".join(ctes) + ",\n" + CLUSTER_MID +
                "\nSELECT id, cluster_id FROM clusters ORDER BY id")
    if name == "dedup_survivors":
        return ("WITH RECURSIVE " + ",\n".join(ctes) + ",\n" + CLUSTER_MID + """,
drop_list AS (SELECT id FROM clusters WHERE id <> cluster_id)
SELECT doc_id FROM corpus WHERE doc_id NOT IN (SELECT id FROM drop_list) ORDER BY doc_id""")
    raise ValueError(name)

if __name__ == "__main__":
    import sys
    print(build(sys.argv[1]))

def simhash_sql():
    fnv_fold = ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
                "list_transform(range(1, len(s)+1), i -> unicode(s[i])::HUGEINT)), "
                f"(h, c) -> ({mulmod('xor(h, c)', FNV_P)}) % {U64})")
    return f"""WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' near duplicate copy' FROM documents WHERE doc_id % 7 = 0),
toks AS (
  SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
    ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tk FROM corpus),
tok_flat AS (SELECT doc_id, unnest(tk) AS s FROM toks),
tok_counts AS (SELECT doc_id, s, count(*) AS c FROM tok_flat GROUP BY doc_id, s),
th AS (SELECT doc_id, c, {fnv_fold} AS uh FROM tok_counts),
bits AS (
  SELECT doc_id, b.range AS b,
    sum(CASE WHEN ((uh >> b.range) % 2) = 1 THEN c ELSE -c END) AS v
  FROM th, range(0, 64) b GROUP BY doc_id, b.range),
shv AS (
  SELECT doc_id,
    sum(CASE WHEN v >= 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS ush
  FROM bits GROUP BY doc_id),
allsh AS (
  SELECT c.doc_id, COALESCE(s.ush, 18446744073709551615::HUGEINT) AS ush
  FROM corpus c LEFT JOIN shv s USING (doc_id)),
bands AS (
  SELECT doc_id, b.range AS band, (ush >> (8 * b.range)) % 256 AS bh
  FROM allsh, range(0, 8) b),
buckets AS (
  SELECT band, bh, (list_sort(list(doc_id)))[1:64] AS ids
  FROM bands GROUP BY band, bh HAVING count(*) > 1),
pairs AS (
  SELECT DISTINCT x.a, y.b2 AS b FROM
    (SELECT band, bh, unnest(ids) AS a FROM buckets) x
    JOIN (SELECT band, bh, unnest(ids) AS b2 FROM buckets) y USING (band, bh)
  WHERE x.a < y.b2),
ham AS (
  SELECT a, pairs.b, bit_count(xor(sa.ush, sb.ush))::INT AS hamming
  FROM pairs JOIN allsh sa ON pairs.a = sa.doc_id JOIN allsh sb ON pairs.b = sb.doc_id)
SELECT a, b, hamming FROM ham WHERE hamming <= 7 ORDER BY a, b"""

LEV_TAIL = """est AS (
  SELECT a, pairs.b,
    len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 64.0 AS est_jaccard
  FROM pairs JOIN sigs sa ON pairs.a = sa.doc_id JOIN sigs sb ON pairs.b = sb.doc_id),
lev AS (
  SELECT e.a, e.b, levenshtein(ca.text, cb.text) AS edit_distance
  FROM est e JOIN corpus ca ON e.a = ca.doc_id JOIN corpus cb ON e.b = cb.doc_id
  WHERE e.est_jaccard >= 0.5)
SELECT a, b, edit_distance FROM lev ORDER BY a, b"""

def build_lev():
    return "WITH " + ",\n".join(minhash_prelude()) + ",\n" + LEV_TAIL
