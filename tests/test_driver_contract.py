"""Mirror of the driver's correctness gate at sf0.001: run a sample of
``__ray_entry__.queries()`` and compare row-count + schema + sorted
values against ``oracle_sql()`` via DuckDB (SURVEY.md §5.2 item 4)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# fast representative subset (full set runs in tools/check_contract.py)
CHECKED = [
    "extract_html_roundtrip",
    "extract_docx_roundtrip",
    "layout_fanout_roundtrip",
    "token_counts",
    "long_docs",
    "lang_rollup",
    "source_rollup",
    "top_sources",
    "lineitem_pricing_rollup",
    "events_type_rollup",
    "schema_validate",
    "ann_topk",
    "exact_dedup_docs",
    "unique_docs",
    "revenue_by_brand",
    "events_hourly",
    "user_event_gaps",
    "sessionize",
    "top_docs_per_source",
    "chars_quantiles",
    "chars_quantiles_by_lang",
    "vocab_topk",
    "distinct_lang_source",
    "segment_sales",
    "range_join_views",
    # round-2 additions
    "extract_pdf_roundtrip",
    "extract_docx_roundtrip",
    "chunk_docs",
    "content_token_counts",
    "events_sliding",
    "asof_last_purchase",
    "structured_extract",
    "lang_id",
    "quality_signals",
    "simhash_dups",
    "bloom_cross_run_dups",
    "hll_users_per_type",
    "minhash_dedup",
    "embedding_near_dups",
    "term_counts_by_source",
    "lsh_recall",
    "ivf_recall",
    "lineage_by_domain",
    # round-3 additions
    "pii_redact",
    "customers_no_orders",
    "urgent_customers_semi",
    "decontaminate",
    "bm25_search",
    "pack_sequences",
    "normalize_text",
    "dedup_paragraphs",
    "repetition_signals",
    "canonical_urls",
    "curate_corpus",
    "latest_event_per_user",
]


def _to_arrow(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)
    return res


def _canon(tbl):
    tbl = tbl.select(sorted(tbl.column_names))
    df = tbl.to_pandas()
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, ray_session, duck):
    import __ray_entry__ as entrymod

    got = _canon(_to_arrow(entrymod.queries()[name](SF)))
    want = _canon(duck.execute(entrymod.oracle_sql()[name]).arrow())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    tbl = _to_arrow(res)
    assert tbl.num_rows >= 1
    assert set(tbl.schema.names) == {"doc_id", "text"}


def test_every_query_has_callable_and_oracle_keys():
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)  # every oracle key is a real query
    assert len(qs) >= 46
    assert all(callable(f) for f in qs.values())
