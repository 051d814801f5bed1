"""Line-level corpus cleaning — the C4 / RefinedWeb preprocessing
stage that runs BELOW document grain.

Web-scraped text carries per-LINE noise that document-level quality
scores average away: navigation stubs, cookie banners, "enable
javascript" notices, share buttons, and boilerplate lines repeated
across millions of pages. C4 (Raffel et al. 2020, §2.2) and
RefinedWeb (Penedo et al. 2023, §3.3) clean at line grain first —
rule-filter each line, drop corpus-wide boilerplate lines, then
reassemble documents and only keep those with enough surviving
content. This module is that stage, Spark-first:

* ``split_lines`` — one ``posexplode`` over ``split(text, '\\n')``:
  map-side, zero shuffle, line order captured as ``line_idx``.
* rule filtering — pure column predicates (word count, terminal
  punctuation, blocklist terms), fused into the scan by Catalyst.
* ``boilerplate_lines`` — the cross-doc pass: groupBy on the LINE
  DIGEST (md5, 32 hex chars — the shuffle never carries line text,
  the same discipline as neardup.exact_text_dedup) counting distinct
  documents per line; lines above ``min_docs`` are corpus
  boilerplate. The resulting blocklist is tiny (boilerplate is by
  definition few distinct strings) and broadcasts back.
* ``clean_documents`` — the composition: rule-filter + boilerplate
  anti-join at line grain, then ONE doc-keyed aggregation rebuilds
  ``text`` with ``array_sort`` over (line_idx, line) structs —
  deterministic under any partitioning (collect_list order is not
  stable; the sort makes the rebuilt text exact), documents below
  ``min_lines`` surviving lines are dropped like C4's three-sentence
  floor.

100 TB shape: two exchanges total — the digest-keyed boilerplate
count (32-char keys) and the doc-keyed rebuild (the surviving corpus,
shuffled once, which any text-rewriting stage needs). Everything else
is map-side. The reference engine has no corpus surface (its dedup is
keyed-event dedup, DeduplicationExample.scala:126-142); this is part
of the LLM-data extension surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# C4's heuristics name "javascript" and the cookie/policy banner
# family explicitly; "lorem ipsum" marks template placeholder pages.
DEFAULT_LINE_BLOCKLIST = ("javascript", "cookie", "lorem ipsum")


def split_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, line_idx, line): one row per line, map-side.

    ``line_idx`` is the 0-based position in the original document —
    the rebuild key. Empty lines are kept here (rules decide)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_idx", "line"
        ),
    )


def line_rule_predicate(
    min_words: int = 3,
    require_terminal_punct: bool = False,
    blocklist: tuple[str, ...] = DEFAULT_LINE_BLOCKLIST,
    line_col: str = "line",
) -> F.Column:
    """The C4 per-line keep-predicate as one boolean column.

    * at least ``min_words`` whitespace words,
    * (optional) ends in terminal punctuation — C4 applies this to
      web text; prose-free corpora turn it off,
    * contains no blocklisted term (case-insensitive substring).
    """
    line = F.col(line_col)
    words = F.size(F.split(F.trim(line), r"\s+"))
    keep = (F.length(F.trim(line)) > 0) & (words >= min_words)
    if require_terminal_punct:
        keep = keep & F.trim(line).rlike(r'[.!?"]$')
    lowered = F.lower(line)
    for term in blocklist:
        keep = keep & ~lowered.contains(term)
    return keep


def boilerplate_lines(
    lines: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    line_col: str = "line",
) -> DataFrame:
    """Lines occurring in ≥ ``min_docs`` DISTINCT documents:
    (line_hash, n_docs). The shuffle carries md5 digests + ids, never
    line text; the output is the (small) boilerplate blocklist."""
    return (
        lines.select(
            F.md5(F.col(line_col)).alias("line_hash"), F.col(id_col)
        )
        .groupBy("line_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def clean_documents(
    docs: DataFrame,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    blocklist: tuple[str, ...] = DEFAULT_LINE_BLOCKLIST,
    boilerplate_min_docs: int | None = 2,
    min_lines: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line-level clean: rule-filter lines, drop corpus
    boilerplate lines, rebuild documents, drop docs with fewer than
    ``min_lines`` surviving lines.

    Returns the input schema minus dropped docs, with ``text``
    rebuilt (original line order, '\\n'-joined) and ``n_lines_kept``
    appended. ``boilerplate_min_docs=None`` skips the cross-doc pass
    (pure map-side rules only)."""
    other_cols = [c for c in docs.columns if c not in (id_col, text_col)]
    lines = split_lines(docs, id_col, text_col).filter(
        line_rule_predicate(min_words, require_terminal_punct, blocklist)
    )
    if boilerplate_min_docs is not None:
        bp = F.broadcast(
            boilerplate_lines(lines, boilerplate_min_docs, id_col)
        )
        lines = lines.withColumn(
            "line_hash", F.md5(F.col("line"))
        ).join(bp, "line_hash", "left_anti")
    rebuilt = (
        lines.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("line_idx", "line"))
            ).alias("__ordered"),
        )
        .filter(F.size("__ordered") >= min_lines)
        .select(
            F.col(id_col),
            F.array_join(
                F.transform("__ordered", lambda s: s["line"]), "\n"
            ).alias(text_col),
            F.size("__ordered").alias("n_lines_kept"),
        )
    )
    if other_cols:
        rebuilt = rebuilt.join(
            docs.select(id_col, *other_cols), id_col
        )
    return rebuilt.select(id_col, text_col, *other_cols, "n_lines_kept")
