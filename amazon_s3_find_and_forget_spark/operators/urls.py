"""URL-level curation operators: normalization, URL-exact dedup, and a
domain blocklist screen.

The one cheap curation stage every public web-corpus pipeline runs
before anything token-level: C4 deduplicates at the URL level and
filters pages from a domain blocklist (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning with a Unified Text-to-Text
Transformer" §2.2 — public); the AI2 Dolma toolkit ships URL dedup and
domain/URL blocklist taggers as first-class filters (Soldaini et al.
2024 — public). Both operate on the page's URL string alone, which is
why the stage costs a projection plus one exact-dedup shuffle — run it
FIRST and the token-level operators downstream see less data.

Scale design (100 TB):
- normalization is a pure codegen ``regexp_replace`` chain — map-only,
  whole-stage, no Python;
- URL dedup shuffles once on the normalized-URL key (map-side
  combinable ``min`` aggregate, the exact_dedup shape — a corpus-hot
  URL is one shuffled key);
- the blocklist screen explodes each host into its <= ~6 label
  suffixes and broadcast-anti-joins the (small, user-supplied)
  blocklist — suffix matching at label boundaries without a LIKE
  cross-join, the standard registrable-domain trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip_to_host_and_path(col: Column) -> Column:
    """Scheme/query/fragment-free remainder of a URL: trim, drop the
    ``#fragment`` then the ``?query`` (first occurrence to end, DOTALL
    so an embedded newline cannot resurrect a suffix), drop the
    ``scheme://`` prefix. What remains is ``host[:port]/path...``."""
    s = F.trim(col)
    s = F.regexp_replace(s, r"(?s)#.*", "")
    s = F.regexp_replace(s, r"(?s)\?.*", "")
    return F.regexp_replace(s, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")


def _host_of(rest: Column) -> Column:
    """Canonical host from the scheme-free remainder: the segment
    before the first ``/``, userinfo (``user:pass@``) dropped,
    lowercased, ``:port`` dropped, leading ``www.`` dropped."""
    host = F.substring_index(rest, "/", 1)
    host = F.regexp_replace(host, r"^[^/@]*@", "")
    host = F.lower(host)
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def normalize_url(col: Column) -> Column:
    """Canonical form of a URL for exact URL-level dedup (the C4 §2.2 /
    Dolma ``url`` dedup key). Deliberately SQL-replicable so catalog
    rows carry FULL value oracles:

    - whitespace-trimmed; ``#fragment`` and ``?query`` dropped;
    - ``scheme://`` dropped (http/https/anything collapse);
    - userinfo dropped; host lowercased; ``:port`` dropped; leading
      ``www.`` dropped;
    - trailing ``/`` runs on the path dropped (``/a/`` == ``/a``; a
      bare host normalizes to the host alone);
    - the PATH keeps its case (path case is significant on most
      servers; only the host is case-insensitive per RFC 3986).

    NULL stays NULL (no URL is not the same URL as another missing
    one — dedup treats NULL keys as never-duplicate)."""
    rest = _strip_to_host_and_path(col)
    host = _host_of(rest)
    # path = remainder after the first '/' (empty when none); computed
    # from the same scheme-free string so host edits never shift it
    first_seg = F.substring_index(rest, "/", 1)
    path_raw = F.substring(rest, F.length(first_seg) + 1, F.length(rest))
    path_clean = F.regexp_replace(path_raw, r"/+$", "")
    return F.concat(host, path_clean)


def url_domain(col: Column) -> Column:
    """The canonical host alone (lowercased, userinfo/port/``www.``
    stripped) — the blocklist matching key."""
    return _host_of(_strip_to_host_and_path(col))


def _domain_suffixes(domain: Column) -> Column:
    """All label-boundary suffixes of a host: ``a.b.example.com`` ->
    [``a.b.example.com``, ``b.example.com``, ``example.com``, ``com``].
    Bounded by the label count (~6 for real hosts), computed map-side
    as a pure array expression."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.when(
        F.coalesce(F.length(domain), F.lit(0)) > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "url_norm",
) -> DataFrame:
    """URL-level exact dedup: keep ONE row per normalized URL — the
    smallest ``id_col`` (the repo-wide deterministic survivor policy) —
    plus every row whose URL normalizes to NULL (no key, never a
    duplicate). Adds ``out_col`` with the normalized URL.

    Scale shape: one map-side-combinable ``min`` aggregate over the
    normalized key and one shuffled semi-join back on
    ``(key, id)`` — identical cost to ``exact_dedup`` on content,
    except the key is ~60 B of URL instead of the document. At 100 TB
    the URL relation is the cheapest dedup key the corpus has; that is
    exactly why C4 runs this stage first."""
    normed = df.withColumn(out_col, normalize_url(F.col(url_col)))
    keyed = normed.where(F.col(out_col).isNotNull())
    canon = keyed.groupBy(out_col).agg(F.min(id_col).alias(id_col))
    survivors = keyed.join(canon, [out_col, id_col], "left_semi")
    return survivors.unionByName(normed.where(F.col(out_col).isNull()))


def filter_blocked_domains(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every row whose URL's host matches a blocklist entry at a
    label boundary — ``example.com`` blocks ``example.com`` AND
    ``ads.example.com``, never ``notexample.com`` (the C4 badwords-
    domain screen / Dolma domain blocklist semantics).

    ``blocked`` is a Python iterable of domain strings or a
    single-column DataFrame. Entries are canonicalized like hosts —
    lowercased, leading/trailing dots stripped (``example.com.`` ==
    ``example.com``), then a leading ``www.`` dropped — identically
    in the iterable and DataFrame branches; empty entries are
    ignored. Rows with a NULL/empty host can match nothing and pass.

    Scale shape: the row side explodes into <= ~6 host suffixes
    (map-side array expression), the blocklist side is broadcast, and
    the screen is one broadcast join + distinct-id anti-join — no
    LIKE cross-join, no shuffle of the corpus beyond the id column."""
    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        bl = blocked.select(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.trim(F.col(bcol))), r"^\.+|\.+$", ""
                ),
                r"^www\.",
                "",
            ).alias("_bdom")
        ).where(F.length("_bdom") > 0).distinct()
    else:
        entries = sorted(
            {
                e.strip().lower().strip(".").removeprefix("www.")
                for e in blocked
                if e and e.strip().strip(".")
            }
        )
        if not entries:
            return df
        bl = spark.createDataFrame([(e,) for e in entries], "_bdom string")
    sufs = df.select(
        F.col(id_col),
        F.explode(_domain_suffixes(url_domain(F.col(url_col)))).alias(
            "_sfx"
        ),
    )
    blocked_ids = (
        sufs.join(F.broadcast(bl), F.col("_sfx") == F.col("_bdom"))
        .select(id_col)
        .distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")
