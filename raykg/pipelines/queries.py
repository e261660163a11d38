"""Driver-contract queries + DuckDB oracle SQL.

Each ``q_*`` callable takes an sf dir, runs (or reuses) the Ray pipeline and
returns a Dataset/DataFrame; ``oracle_for`` builds the equivalent ANSI SQL
over the *same* deterministic corpus parquet, sharing the regex constants
with the engine (``raykg.stages.split`` / ``raykg.stages.extract``) so there
is no drift.  Column names and integer widths match exactly (driver hashes
values under sorted column names).

The SQL reimplements the reference-transposed semantics independently:
sentence splitting with abbreviation protection, capitalized-token mentions
with blocklist, title→PERSON, SVO verb mapping, alias-table resolution and
the union-find closure (2-round min-propagation — exact for the generated
corpus, whose alias components are stars; the engine's iterative union-find
handles arbitrary graphs and is tested separately).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raykg import vocab
from raykg.pipelines import kg
from raykg.sources import synthetic_corpus as sc
from raykg.stages import extract, split

_KG_CACHE: dict[str, dict] = {}

PROSE_TYPES = ("character", "place", "object", "unknown")


def kg_paths(sf_dir: str) -> dict:
    if sf_dir not in _KG_CACHE:
        _KG_CACHE[sf_dir] = kg.build_kg(sf_dir)
    return _KG_CACHE[sf_dir]


def _cast_ints(cols: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.cast(t[c], pa.int64()))
        return t
    return fn


# --------------------------------------------------------------- Ray queries

def q_kg_units(sf_dir: str):
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["units"], columns=[
        "doc_sha256", "repo", "path", "lang", "unit_id", "chapter_num",
        "paragraph_num", "sentence_num", "text"])
    return ds.map_batches(
        _cast_ints(["chapter_num", "paragraph_num", "sentence_num"]),
        batch_format="pyarrow")


def q_kg_mentions(sf_dir: str):
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["mentions"], columns=[
        "unit_id", "doc_sha256", "lang", "mention_text", "label",
        "confidence", "n_occurrences"])
    return (ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "txt")).drop_columns(["lang"]),
        batch_format="pyarrow"))


def q_kg_nodes(sf_dir: str):
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["nodes"], columns=[
        "entity_id", "canonical_name", "entity_type", "mention_count",
        "n_units"])
    return (ds.map_batches(
        lambda t: t.filter(pc.is_in(t["entity_type"],
                                    value_set=pa.array(PROSE_TYPES))),
        batch_format="pyarrow")
        .map_batches(_cast_ints(["mention_count", "n_units"]),
                     batch_format="pyarrow"))


def q_kg_top_entities(sf_dir: str):
    # A6 top-k: sort desc + deterministic tie-break, limit 20
    return (q_kg_nodes(sf_dir)
            .sort(["mention_count", "entity_id"], descending=[True, False])
            .limit(20))


def q_kg_triples(sf_dir: str):
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["triples"], columns=[
        "subj", "pred", "obj", "subj_type", "obj_type", "mention_count",
        "confidence"])
    return ds.map_batches(_cast_ints(["mention_count"]),
                          batch_format="pyarrow")


def q_kg_mention_edges(sf_dir: str):
    # S9: entity↔unit mention counts (prose side)
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["mentions"], columns=[
        "entity_id", "unit_id", "lang", "n_occurrences"])
    return (ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "txt")),
        batch_format="pyarrow")
        .groupby(["entity_id", "unit_id"])
        .map_groups(lambda g: pd.DataFrame({
            "entity_id": [g["entity_id"].iloc[0]],
            "unit_id": [g["unit_id"].iloc[0]],
            "mention_count": [int(g["n_occurrences"].sum())]}),
            batch_format="pandas"))


def q_kg_code_symbols(sf_dir: str):
    # code-domain entity stats: per (symbol, label) mention totals
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["mentions"], columns=[
        "entity_id", "label", "lang", "path"])
    return (ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "py")),
        batch_format="pyarrow")
        .groupby(["entity_id", "label"])
        .map_groups(lambda g: pd.DataFrame({
            "entity_id": [g["entity_id"].iloc[0]],
            "label": [g["label"].iloc[0]],
            "n_mentions": [len(g)],
            "n_files": [g["path"].nunique()]}),
            batch_format="pandas"))


def q_kg_cooccurrence(sf_dir: str):
    """A18/C1: per-unit entity-pair co-occurrence counts (pair explode →
    groupby), pairs ordered (a < b), count ≥ 2 filter."""
    p = kg_paths(sf_dir)
    ds = rd.read_parquet(p["mentions"],
                         columns=["unit_id", "lang", "entity_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["entity_id"]))
        rows_a, rows_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows_a.append(ids[i])
                rows_b.append(ids[j])
        return pd.DataFrame({"entity_a": rows_a, "entity_b": rows_b})

    # groupby(unit) co-locates a unit's mention rows before the pair
    # explode — a block boundary may otherwise split a unit across batches
    # and silently drop cross-boundary pairs.
    return (ds.map_batches(
                lambda t: t.filter(pc.equal(t["lang"], "txt")),
                batch_format="pyarrow")
            .groupby("unit_id").map_groups(pairs, batch_format="pandas")
            .groupby(["entity_a", "entity_b"])
            .map_groups(lambda g: pd.DataFrame({
                "entity_a": [g["entity_a"].iloc[0]],
                "entity_b": [g["entity_b"].iloc[0]],
                "pair_count": [len(g)]}), batch_format="pandas")
            .filter(lambda r: r["pair_count"] >= 2))


# ------------------------------------------------------------- oracle SQL

def _trim(e: str) -> str:
    return f"trim({e}, ' '||chr(9)||chr(10)||chr(13))"


def units_cte(corpus_path: str) -> str:
    """WITH-clause body producing ``units`` from the corpus parquet,
    mirroring raykg.stages.split exactly (same regex constants)."""
    abbrev = split.ABBREV_PATTERN
    sent_b = split.SENT_BOUNDARY_PATTERN
    para = split.PARA_SPLIT_PATTERN
    chap = "(?m)^" + split.CHAPTER_HEADER_PATTERN + "$"
    ws_norm = _trim("regexp_replace(replace(sent_piece, chr(30), '.'), "
                    "'" + "\\s+" + "', ' ', 'g')")
    return f"""
corpus AS (
  SELECT repo, path, lang, content, sha256(content) AS doc_sha256
  FROM read_parquet('{corpus_path}')
),
ch_raw AS (
  SELECT doc_sha256, repo, path, lang,
         unnest(pieces) AS piece,
         unnest(range(1, len(pieces)+1)) AS ch_idx,
         len(pieces) AS n_pieces
  FROM (
    SELECT doc_sha256, repo, path, lang,
           string_split(regexp_replace(content, '{chap}', chr(2), 'g'),
                        chr(2)) AS pieces
    FROM corpus WHERE lang = 'txt')
),
chapters AS (
  SELECT doc_sha256, repo, path, lang, piece,
         CASE WHEN n_pieces = 1 THEN 1
              WHEN ch_idx = 1 THEN 0
              ELSE ch_idx - 1 END AS chapter_num
  FROM ch_raw
  WHERE n_pieces = 1
     OR (ch_idx > 1 AND length({_trim('piece')}) > 0)
     OR (ch_idx = 1 AND length({_trim('piece')}) > 100)
),
par_raw AS (
  SELECT doc_sha256, repo, path, lang, chapter_num,
         unnest(paras) AS para,
         unnest(range(1, len(paras)+1)) AS p_idx
  FROM (SELECT *, regexp_split_to_array(piece, '{para}') AS paras
        FROM chapters)
),
paragraphs AS (
  SELECT *, row_number() OVER (PARTITION BY doc_sha256, chapter_num
                               ORDER BY p_idx) AS paragraph_num
  FROM par_raw WHERE length({_trim('para')}) > 0
),
sent_raw AS (
  SELECT doc_sha256, repo, path, lang, chapter_num, paragraph_num,
         unnest(sents) AS sent_piece,
         unnest(range(1, len(sents)+1)) AS s_idx
  FROM (SELECT *, string_split(
          regexp_replace(
            regexp_replace({_trim('para')}, '{abbrev}',
                           '\\1' || chr(30), 'g'),
            '{sent_b}', '\\1' || chr(31) || '\\2', 'g'),
          chr(31)) AS sents
        FROM paragraphs)
),
sentences AS (
  SELECT doc_sha256, repo, path, lang, chapter_num, paragraph_num, s_idx,
         {ws_norm} AS text
  FROM sent_raw
),
prose_units AS (
  SELECT doc_sha256, repo, path, lang, chapter_num, paragraph_num,
         row_number() OVER (PARTITION BY doc_sha256, chapter_num,
                            paragraph_num ORDER BY s_idx) AS sentence_num,
         text
  FROM sentences WHERE length(text) > 0 AND length(text) <= 1000
),
code_raw AS (
  SELECT doc_sha256, repo, path, lang,
         unnest(blocks) AS block,
         unnest(range(1, len(blocks)+1)) AS b_idx
  FROM (SELECT doc_sha256, repo, path, lang,
               regexp_split_to_array(content, '{para}') AS blocks
        FROM corpus WHERE lang <> 'txt')
),
code_units AS (
  SELECT doc_sha256, repo, path, lang, 1 AS chapter_num,
         row_number() OVER (PARTITION BY doc_sha256
                            ORDER BY b_idx) AS paragraph_num,
         1 AS sentence_num, {_trim('block')} AS text
  FROM code_raw WHERE length({_trim('block')}) > 0
),
units AS (
  SELECT *, substr(doc_sha256, 1, 12) || '_c' || chapter_num || '_p' ||
            paragraph_num || '_s' || sentence_num AS unit_id
  FROM (SELECT * FROM prose_units UNION ALL SELECT * FROM code_units)
)"""


def mentions_cte() -> str:
    """Extends units → prose ``mentions`` (one row per unit × surface)."""
    block = ", ".join(f"'{w}'" for w in vocab.CAP_BLOCKLIST)
    return f"""
tok_raw AS (
  SELECT unit_id, doc_sha256,
         unnest(regexp_extract_all(text, '{extract.CAP_TOKEN_PATTERN}')) AS tok
  FROM units WHERE lang = 'txt'
),
title_names AS (
  SELECT DISTINCT unit_id,
         unnest(regexp_extract_all(text, '{extract.TITLE_NAME_PATTERN}', 1)) AS name
  FROM units WHERE lang = 'txt'
),
mentions AS (
  SELECT t.unit_id, t.doc_sha256, t.tok AS mention_text,
         CASE WHEN tn.name IS NOT NULL THEN 'PERSON' ELSE 'UNKNOWN' END AS label,
         CASE WHEN tn.name IS NOT NULL THEN {extract.TITLE_CONF} ELSE {extract.MENTION_CONF} END AS confidence,
         count(*) AS n_occurrences
  FROM tok_raw t
  LEFT JOIN title_names tn ON tn.unit_id = t.unit_id AND tn.name = t.tok
  WHERE t.tok NOT IN ({block})
  GROUP BY 1, 2, 3, 4, 5
)"""


def resolution_cte(alias_path: str) -> str:
    """alias-table resolution + alias-statement union-find closure
    (2-round min propagation; exact for star-shaped components)."""
    return f"""
alias_keys AS (
  SELECT entity_id, entity_type, canonical_name, lower(canonical_name) AS k
  FROM read_parquet('{alias_path}')
  UNION ALL
  SELECT entity_id, entity_type, canonical_name, lower(unnest(aliases)) AS k
  FROM read_parquet('{alias_path}')
),
apair_raw AS (
  SELECT unnest(regexp_extract_all(text, '{extract.ALIAS_STMT_PATTERN}', 1)) AS a,
         unnest(regexp_extract_all(text, '{extract.ALIAS_STMT_PATTERN}', 2)) AS b
  FROM units WHERE lang = 'txt'
),
apair_ids AS (
  SELECT coalesce(ka.entity_id, lower(a)) AS ua,
         coalesce(kb.entity_id, lower(b)) AS ub
  FROM apair_raw
  LEFT JOIN alias_keys ka ON ka.k = lower(a)
  LEFT JOIN alias_keys kb ON kb.k = lower(b)
),
uf_edges AS (
  SELECT DISTINCT least(ua, ub) AS u, greatest(ua, ub) AS v
  FROM apair_ids WHERE ua <> ub
),
uf_nbr AS (
  SELECT u AS node, v AS nbr FROM uf_edges
  UNION ALL
  SELECT v AS node, u AS nbr FROM uf_edges
),
uf_r1 AS (
  SELECT node, least(node, min(nbr)) AS rep FROM uf_nbr GROUP BY node
),
uf_rep AS (
  SELECT nb.node, least(min(rs.rep), min(rn.rep)) AS rep
  FROM uf_nbr nb
  JOIN uf_r1 rs ON rs.node = nb.node
  JOIN uf_r1 rn ON rn.node = nb.nbr
  GROUP BY nb.node
),
resolved AS (
  SELECT m.*,
         coalesce(r.rep, coalesce(ak.entity_id, lower(m.mention_text))) AS entity_id,
         ak.entity_id IS NOT NULL AS known,
         ak.entity_type AS known_type,
         ak.canonical_name AS known_name
  FROM mentions m
  LEFT JOIN alias_keys ak ON ak.k = lower(m.mention_text)
  LEFT JOIN uf_rep r ON r.node = coalesce(ak.entity_id, lower(m.mention_text))
)"""


def _verb_case(col: str) -> str:
    whens = "\n    ".join(
        f"WHEN '{v}' THEN '{p}'"
        for v, p in sorted(vocab.VERB_PHRASE_TO_PRED.items()))
    return f"CASE {col} {whens} ELSE '{vocab.FALLBACK_PREDICATE}' END"


def oracle_for(name: str, sf_dir: str) -> str:
    data_dir = sc.corpus_dir(sf_dir)
    corpus_path = os.path.join(data_dir, "corpus.parquet")
    alias_path = os.path.join(data_dir, "alias_table.parquet")
    U = units_cte(corpus_path)
    M = mentions_cte()
    R = resolution_cte(alias_path)

    if name == "kg_units":
        return (f"WITH {U} SELECT doc_sha256, repo, path, lang, unit_id, "
                "CAST(chapter_num AS BIGINT) AS chapter_num, "
                "CAST(paragraph_num AS BIGINT) AS paragraph_num, "
                "CAST(sentence_num AS BIGINT) AS sentence_num, text FROM units")

    if name == "kg_mentions":
        return (f"WITH {U},{M} SELECT unit_id, doc_sha256, mention_text, "
                "label, confidence, n_occurrences FROM mentions")

    nodes_sql = f"""
node_names AS (
  SELECT entity_id, mention_text,
         row_number() OVER (PARTITION BY entity_id
                            ORDER BY CAST(sum(n_occurrences) AS BIGINT) DESC,
                                     mention_text ASC) AS rn
  FROM resolved GROUP BY entity_id, mention_text
),
nodes AS (
  SELECT r.entity_id,
         CASE WHEN bool_or(r.known) THEN max(r.known_name)
              ELSE max(nn.mention_text) END AS canonical_name,
         CASE WHEN bool_or(r.known) THEN max(r.known_type)
              WHEN bool_or(r.label = 'PERSON') THEN 'character'
              ELSE 'unknown' END AS entity_type,
         CAST(sum(r.n_occurrences) AS BIGINT) AS mention_count,
         count(DISTINCT r.unit_id) AS n_units
  FROM resolved r
  LEFT JOIN node_names nn ON nn.entity_id = r.entity_id AND nn.rn = 1
  GROUP BY r.entity_id
)"""

    if name == "kg_nodes":
        return (f"WITH {U},{M},{R},{nodes_sql} "
                "SELECT entity_id, canonical_name, entity_type, "
                "mention_count, n_units FROM nodes")

    if name == "kg_top_entities":
        return (f"WITH {U},{M},{R},{nodes_sql} "
                "SELECT entity_id, canonical_name, entity_type, "
                "mention_count, n_units FROM nodes "
                "ORDER BY mention_count DESC, entity_id ASC LIMIT 20")

    if name == "kg_mention_edges":
        return (f"WITH {U},{M},{R} "
                "SELECT entity_id, unit_id, CAST(sum(n_occurrences) AS BIGINT) AS mention_count "
                "FROM resolved GROUP BY 1, 2")

    if name == "kg_cooccurrence":
        return (f"WITH {U},{M},{R} "
                """SELECT a.entity_id AS entity_a, b.entity_id AS entity_b,
                          count(*) AS pair_count
                   FROM (SELECT DISTINCT unit_id, entity_id FROM resolved) a
                   JOIN (SELECT DISTINCT unit_id, entity_id FROM resolved) b
                     ON a.unit_id = b.unit_id AND a.entity_id < b.entity_id
                   GROUP BY 1, 2 HAVING count(*) >= 2""")

    if name == "kg_code_symbols":
        return f"""WITH {U},
imp AS (
  SELECT path, doc_sha256,
         unnest(regexp_extract_all(content, '{extract.CODE_IMPORT_PATTERN}', 1)) AS target,
         unnest(regexp_extract_all(content, '{extract.CODE_IMPORT_PATTERN}', 2)) AS local
  FROM corpus WHERE lang <> 'txt'
),
modname AS (
  SELECT path, doc_sha256,
         regexp_replace(regexp_replace(path, '.*/', ''), '\\.[a-z]+$', '') AS module
  FROM corpus WHERE lang <> 'txt'
),
defs AS (
  SELECT d.path, mn.module || '.' ||
         unnest(regexp_extract_all(d.content, '{extract.CODE_DEF_PATTERN}', 1)) AS sym
  FROM corpus d JOIN modname mn ON mn.path = d.path AND mn.doc_sha256 = sha256(d.content)
  WHERE d.lang <> 'txt'
),
calls_dotted AS (
  SELECT c.path,
         unnest(regexp_extract_all(c.content, '(?m)^\\s+(\\w+)\\.(\\w+)\\(\\)', 1)) AS qual,
         unnest(regexp_extract_all(c.content, '(?m)^\\s+(\\w+)\\.(\\w+)\\(\\)', 2)) AS fn
  FROM corpus c WHERE c.lang <> 'txt'
),
calls_resolved AS (
  SELECT cd.path,
         coalesce(i.target, cd.qual) || '.' || cd.fn AS sym
  FROM calls_dotted cd
  LEFT JOIN (SELECT path, coalesce(nullif(local, ''), target) AS local, target
             FROM imp) i
    ON i.path = cd.path AND i.local = cd.qual
),
calls_bare AS (
  SELECT c.path, mn.module,
         unnest(regexp_extract_all(c.content, '(?m)^\\s+(\\w+)\\(\\)', 1)) AS fn
  FROM corpus c JOIN modname mn ON mn.path = c.path
  WHERE c.lang <> 'txt'
),
calls_bare_resolved AS (
  SELECT cb.path,
         CASE WHEN d.sym IS NOT NULL THEN cb.module || '.' || cb.fn
              ELSE cb.fn END AS sym
  FROM calls_bare cb
  LEFT JOIN (SELECT DISTINCT path, sym FROM defs) d
    ON d.path = cb.path AND d.sym = cb.module || '.' || cb.fn
),
code_mentions AS (
  SELECT target AS entity_id, 'MODULE' AS label, path FROM imp
  UNION ALL
  SELECT module AS entity_id, 'MODULE' AS label, path FROM modname
  UNION ALL
  SELECT sym, 'FUNCTION', path FROM defs
  UNION ALL
  SELECT sym, 'CALL', path FROM calls_resolved
  UNION ALL
  SELECT sym, 'CALL', path FROM calls_bare_resolved
)
SELECT entity_id, label, count(*) AS n_mentions,
       count(DISTINCT path) AS n_files
FROM code_mentions GROUP BY 1, 2"""

    if name == "kg_triples":
        svo = extract.SVO_PATTERN.replace("'", "''")
        return f"""WITH {U},{M},{R},{nodes_sql},
svo AS (
  SELECT unit_id,
         unnest(regexp_extract_all(text, '{svo}', 1)) AS s,
         unnest(regexp_extract_all(text, '{svo}', 2)) AS verb,
         unnest(regexp_extract_all(text, '{svo}', 3)) AS o
  FROM units WHERE lang = 'txt'
),
svo_mapped AS (
  SELECT DISTINCT unit_id, lower(s) AS s_key, lower(o) AS o_key,
         {_verb_case('verb')} AS pred
  FROM svo
),
key_final AS (
  SELECT DISTINCT lower(mention_text) AS k, entity_id FROM resolved
),
prose_rels AS (
  SELECT coalesce(ks.entity_id, sm.s_key) AS subj, sm.pred,
         coalesce(ko.entity_id, sm.o_key) AS obj,
         {extract.REL_CONF} AS confidence
  FROM svo_mapped sm
  LEFT JOIN key_final ks ON ks.k = sm.s_key
  LEFT JOIN key_final ko ON ko.k = sm.o_key
),
modname AS (
  SELECT path, regexp_replace(regexp_replace(path, '.*/', ''), '\\.[a-z]+$', '') AS module
  FROM corpus WHERE lang <> 'txt'
),
imp AS (
  SELECT c.path, mn.module,
         unnest(regexp_extract_all(c.content, '{extract.CODE_IMPORT_PATTERN}', 1)) AS target,
         unnest(regexp_extract_all(c.content, '{extract.CODE_IMPORT_PATTERN}', 2)) AS local
  FROM corpus c JOIN modname mn ON mn.path = c.path WHERE c.lang <> 'txt'
),
defs AS (
  SELECT c.path, mn.module,
         unnest(regexp_extract_all(c.content, '{extract.CODE_DEF_PATTERN}', 1)) AS d
  FROM corpus c JOIN modname mn ON mn.path = c.path WHERE c.lang <> 'txt'
),
code_rels AS (
  SELECT module AS subj, 'IMPORTS' AS pred, target AS obj FROM imp
  UNION ALL
  SELECT module, 'ALIASES', target FROM imp WHERE nullif(local,'') IS NOT NULL
  UNION ALL
  SELECT module, 'DEFINES', module || '.' || d FROM defs
),
call_rels AS (
  -- caller attribution needs per-line enclosing-def state; the engine does
  -- this in one pass — here we reconstruct it with line numbers
  SELECT mn.module || '.' || last_def.d AS subj, 'CALLS' AS pred,
         coalesce(i.target, cl.qual) || '.' || cl.fn AS obj, cl.path
  FROM (
    SELECT path, ln,
           regexp_extract(line, '^\\s+(\\w+)\\.(\\w+)\\(\\)', 1) AS qual,
           regexp_extract(line, '^\\s+(\\w+)\\.(\\w+)\\(\\)', 2) AS fn
    FROM (SELECT path, unnest(string_split(content, chr(10))) AS line,
                 unnest(range(1, len(string_split(content, chr(10)))+1)) AS ln
          FROM corpus WHERE lang <> 'txt')
    WHERE regexp_matches(line, '^\\s+(\\w+)\\.(\\w+)\\(\\)')
  ) cl
  JOIN modname mn ON mn.path = cl.path
  JOIN LATERAL (
    SELECT regexp_extract(dl.line, '^(?:def|class) (\\w+)', 1) AS d
    FROM (SELECT path, unnest(string_split(content, chr(10))) AS line,
                 unnest(range(1, len(string_split(content, chr(10)))+1)) AS ln
          FROM corpus WHERE lang <> 'txt') dl
    WHERE dl.path = cl.path AND dl.ln < cl.ln
      AND regexp_matches(dl.line, '^(?:def|class) (\\w+)')
    ORDER BY dl.ln DESC LIMIT 1
  ) last_def ON true
  LEFT JOIN (SELECT path, coalesce(nullif(local,''), target) AS local, target
             FROM imp) i ON i.path = cl.path AND i.local = cl.qual
),
call_rels_bare AS (
  SELECT mn.module || '.' || last_def.d AS subj, 'CALLS' AS pred,
         CASE WHEN dd.d IS NOT NULL THEN mn.module || '.' || cl.fn
              ELSE cl.fn END AS obj
  FROM (
    SELECT path, ln, regexp_extract(line, '^\\s+(\\w+)\\(\\)', 1) AS fn
    FROM (SELECT path, unnest(string_split(content, chr(10))) AS line,
                 unnest(range(1, len(string_split(content, chr(10)))+1)) AS ln
          FROM corpus WHERE lang <> 'txt')
    WHERE regexp_matches(line, '^\\s+(\\w+)\\(\\)')
  ) cl
  JOIN modname mn ON mn.path = cl.path
  JOIN LATERAL (
    SELECT regexp_extract(dl.line, '^(?:def|class) (\\w+)', 1) AS d
    FROM (SELECT path, unnest(string_split(content, chr(10))) AS line,
                 unnest(range(1, len(string_split(content, chr(10)))+1)) AS ln
          FROM corpus WHERE lang <> 'txt') dl
    WHERE dl.path = cl.path AND dl.ln < cl.ln
      AND regexp_matches(dl.line, '^(?:def|class) (\\w+)')
    ORDER BY dl.ln DESC LIMIT 1
  ) last_def ON true
  LEFT JOIN (SELECT DISTINCT path, module || '.' || d AS fq, d
             FROM defs) dd ON dd.path = cl.path AND dd.d = cl.fn
),
all_rels AS (
  SELECT subj, pred, obj, confidence FROM prose_rels
  UNION ALL
  SELECT subj, pred, obj, {extract.CODE_CONF} FROM code_rels
  UNION ALL
  SELECT subj, pred, obj, {extract.CODE_CONF} FROM call_rels
  UNION ALL
  SELECT subj, pred, obj, {extract.CODE_CONF} FROM call_rels_bare
),
code_types AS (
  SELECT DISTINCT target AS entity_id, 'module' AS t FROM imp
  UNION SELECT DISTINCT module, 'module' FROM modname
  UNION SELECT DISTINCT module || '.' || d, 'function' FROM defs
  UNION SELECT DISTINCT obj, 'function' FROM call_rels
  UNION SELECT DISTINCT obj, 'function' FROM call_rels_bare
),
type_map AS (
  SELECT entity_id, entity_type FROM nodes
  UNION ALL
  SELECT entity_id, min(t) FROM code_types
  WHERE entity_id NOT IN (SELECT entity_id FROM nodes)
  GROUP BY entity_id
)
SELECT ar.subj, ar.pred, ar.obj,
       coalesce(ts.entity_type, 'unknown') AS subj_type,
       coalesce(tt.entity_type, 'unknown') AS obj_type,
       count(*) AS mention_count,
       max(ar.confidence) AS confidence
FROM all_rels ar
LEFT JOIN type_map ts ON ts.entity_id = ar.subj
LEFT JOIN type_map tt ON tt.entity_id = ar.obj
GROUP BY 1, 2, 3, 4, 5"""

    raise KeyError(name)


QUERY_FNS = {
    "kg_units": q_kg_units,
    "kg_mentions": q_kg_mentions,
    "kg_nodes": q_kg_nodes,
    "kg_top_entities": q_kg_top_entities,
    "kg_triples": q_kg_triples,
    "kg_mention_edges": q_kg_mention_edges,
    "kg_code_symbols": q_kg_code_symbols,
    "kg_cooccurrence": q_kg_cooccurrence,
}
