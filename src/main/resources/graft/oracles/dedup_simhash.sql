WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' near duplicate copy' FROM documents WHERE doc_id % 7 = 0),
toks AS (
  SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk FROM corpus),
tok_flat AS (SELECT doc_id, unnest(tk) AS s FROM toks),
tok_counts AS (SELECT doc_id, s, count(*) AS c FROM tok_flat GROUP BY doc_id, s),
th AS (SELECT doc_id, c, list_reduce(list_prepend(14695981039346656037::HUGEINT, list_transform(range(1, len(s)+1), i -> unicode(s[i])::HUGEINT)), (h, c) -> (((((xor(h, c)) >> 32) * 1099511628211::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT + ((xor(h, c)) % 4294967296::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS uh FROM tok_counts),
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
SELECT a, b, hamming FROM ham WHERE hamming <= 7 ORDER BY a, b