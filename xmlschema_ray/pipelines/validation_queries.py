"""Oracle-checked validation queries over the driver testdata tables.

These run the SAME facet kernels and spec machinery as the flagship
sequence engine, but over the TPC-H-ish tables with deliberately tightened
constraints (the testdata is clean, so tightened bounds produce
deterministic nonzero violation sets) and emit TYPED violation rows
(original key columns + constraint_name + column) so DuckDB can reproduce
them exactly with WHERE NOT(...) unions.

This is the per-query proof that the engine's violation semantics match an
independent SQL engine — the analog of the reference's cross-validation
against lxml (``/root/reference/xmlschema/tests/test_factory.py:35``).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
from xmlschema_ray.engine.row_validator import iter_row_checks
from xmlschema_ray.ops.relational import anti_join, combiner_aggregate
from xmlschema_ray.pipelines.common import table_path


class TypedViolations:
    """map_batches kernel: spec checks → typed violation rows.

    Unlike the engine's canonical string-keyed violation stream, this keeps
    the table's own key columns typed so the result is directly comparable
    to a SQL oracle.
    """

    def __init__(self, spec: TableConstraints, key_cols: Sequence[str]):
        self.spec = spec.compile()
        self.key_cols = list(key_cols)

    def __call__(self, table: pa.Table) -> pa.Table:
        pieces: List[pa.Table] = []
        for cname, col, mask, _reason, _reprs in iter_row_checks(table, self.spec):
            idx = np.flatnonzero(mask)
            sub = table.select(self.key_cols).take(pa.array(idx, type=pa.int64()))
            sub = sub.append_column("constraint_name", pa.array([cname] * len(idx), type=pa.string()))
            sub = sub.append_column("col_name", pa.array([col] * len(idx), type=pa.string()))
            pieces.append(sub)
        if pieces:
            return pa.concat_tables(pieces)
        empty = table.select(self.key_cols).slice(0, 0)
        empty = empty.append_column("constraint_name", pa.array([], type=pa.string()))
        empty = empty.append_column("col_name", pa.array([], type=pa.string()))
        return empty


def _run_typed(sf_dir: str, tbl: str, spec: TableConstraints, key_cols: List[str], columns: List[str]):
    ds = rd.read_parquet(table_path(sf_dir, tbl), columns=columns)
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, key_cols)
        return tv(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# -- lineitem range facets ------------------------------------------------


def val_lineitem_ranges(sf_dir: str):
    spec = TableConstraints(
        name="lineitem_checks",
        columns=[
            ColumnSpec("l_orderkey", pa.int64()),
            ColumnSpec("l_linenumber", pa.int32()),
            ColumnSpec("l_quantity", pa.float64(), facets=(F.MaxInclusive(45.0),)),
            ColumnSpec("l_discount", pa.float64(), facets=(F.MaxInclusive(0.08),)),
            ColumnSpec("l_tax", pa.float64(), facets=(F.MaxInclusive(0.05),)),
        ],
        key_columns=("l_orderkey", "l_linenumber"),
    )
    return _run_typed(
        sf_dir,
        "lineitem",
        spec,
        ["l_orderkey", "l_linenumber"],
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )


VAL_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity.maxInclusive(45.0)' AS constraint_name, 'l_quantity' AS col_name
FROM lineitem WHERE NOT (l_quantity <= 45.0)
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount.maxInclusive(0.08)', 'l_discount'
FROM lineitem WHERE NOT (l_discount <= 0.08)
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax.maxInclusive(0.05)', 'l_tax'
FROM lineitem WHERE NOT (l_tax <= 0.05)
"""


# -- events enumeration facet --------------------------------------------


def val_events_enum(sf_dir: str):
    spec = TableConstraints(
        name="events_checks",
        columns=[
            ColumnSpec("event_id", pa.int64()),
            ColumnSpec(
                "event_type",
                pa.string(),
                facets=(F.Enumeration(("click", "purchase", "signup", "view")),),
            ),
        ],
        key_columns=("event_id",),
    )
    return _run_typed(sf_dir, "events", spec, ["event_id"], ["event_id", "event_type"])


VAL_EVENTS_ENUM_SQL = """
SELECT event_id,
       'event_type.enumeration([''click'', ''purchase'', ''signup'', ''view''])' AS constraint_name,
       'event_type' AS col_name
FROM events WHERE event_type NOT IN ('click', 'purchase', 'signup', 'view')
"""


# -- documents: enum + range + pattern -----------------------------------


def val_documents(sf_dir: str):
    spec = TableConstraints(
        name="document_checks",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("lang", pa.string(), facets=(F.Enumeration(("de", "en", "es", "fr")),)),
            ColumnSpec("n_chars", pa.int64(), facets=(F.MaxInclusive(500),)),
            ColumnSpec("source", pa.string(), facets=(F.Pattern(r"src[0-9]{1,2}"),)),
        ],
        key_columns=("doc_id",),
    )
    return _run_typed(
        sf_dir, "documents", spec, ["doc_id"], ["doc_id", "lang", "n_chars", "source"]
    )


VAL_DOCUMENTS_SQL = """
SELECT doc_id, 'lang.enumeration([''de'', ''en'', ''es'', ''fr''])' AS constraint_name, 'lang' AS col_name
FROM documents WHERE lang NOT IN ('de', 'en', 'es', 'fr')
UNION ALL
SELECT doc_id, 'n_chars.maxInclusive(500)', 'n_chars' FROM documents WHERE NOT (n_chars <= 500)
UNION ALL
SELECT doc_id, 'source.pattern(''src[0-9]{1,2}'')', 'source'
FROM documents WHERE NOT regexp_matches(source, '^(src[0-9]{1,2})$')
"""


# -- nested struct column: per-field facet stacks (complex-type analog) ---


def val_nested_struct(sf_dir: str):
    """Complex-type/struct validation (reference
    ``validators/complex_types.py:532-575``): lineitem rows are packed into
    a ``pa.struct`` column (the nested-metadata shape real training tables
    carry) and validated with per-FIELD facet stacks — range on
    ``quantity``, enumeration on ``flag``, and required-presence on ``tax``
    (made null when l_tax = 0, the attribute ``use='required'`` analog)."""
    struct_type = pa.struct(
        [
            pa.field("quantity", pa.float64()),
            pa.field("flag", pa.string()),
            pa.field("tax", pa.float64()),
        ]
    )

    def pack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tax = pc.if_else(
            pc.greater(t["l_tax"], 0.0), t["l_tax"], pa.nulls(t.num_rows, pa.float64())
        )
        props = pa.StructArray.from_arrays(
            [
                t["l_quantity"].combine_chunks(),
                t["l_returnflag"].combine_chunks(),
                tax.combine_chunks() if isinstance(tax, pa.ChunkedArray) else tax,
            ],
            fields=list(struct_type),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "props": props,
            }
        )

    spec = TableConstraints(
        name="nested_checks",
        columns=[
            ColumnSpec("l_orderkey", pa.int64()),
            ColumnSpec("l_linenumber", pa.int32()),
            ColumnSpec(
                "props",
                struct_type,
                facets=(
                    F.StructField("quantity", (F.MaxInclusive(46.0),)),
                    F.StructField("flag", (F.Enumeration(("A", "N")),)),
                    F.StructField("tax", required=True),
                ),
            ),
        ],
        key_columns=("l_orderkey", "l_linenumber"),
    )
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_tax"],
    ).map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, ["l_orderkey", "l_linenumber"])
        return tv(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


VAL_NESTED_STRUCT_SQL = """
SELECT l_orderkey, l_linenumber,
       'props.field(quantity)[maxInclusive(46.0)]' AS constraint_name, 'props' AS col_name
FROM lineitem WHERE NOT (l_quantity <= 46.0)
UNION ALL
SELECT l_orderkey, l_linenumber, 'props.field(flag)[enumeration([''A'', ''N''])]', 'props'
FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
UNION ALL
SELECT l_orderkey, l_linenumber, 'props.field(tax)[required,]', 'props'
FROM lineitem WHERE NOT (l_tax > 0.0)
"""


# -- binary-lexical lengths: hexBinary / base64Binary decoded octets ------


def val_hex_length(sf_dir: str):
    """Decoded-octet length facets over DERIVED lexical binary columns
    (reference ``facets.py:165-172,208-215,251-258``: XSD length counts
    decoded octets, and an undecodable lexical form fails every length
    facet). Columns are derived from ``md5(text)`` prefixes whose length
    varies with ``doc_id`` so odd-hex / non-multiple-of-4 base64 forms
    (NaN octet count → every comparison fires) appear deterministically;
    the SQL oracle re-derives the same prefixes with DuckDB's ``md5``.
    """
    import hashlib

    spec = TableConstraints(
        name="binary_length_checks",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("hexcol", pa.string(), facets=(F.Length(4, encoding="hex"),)),
            ColumnSpec(
                "b64col",
                pa.string(),
                facets=(F.MinLength(4, encoding="base64"), F.MaxLength(6, encoding="base64")),
            ),
        ],
        key_columns=("doc_id",),
    )

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        digests = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]]
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": ids,
                "hexcol": [d[: 8 + int(i) % 3] for d, i in zip(digests, ids)],
                "b64col": [d[: 8 + int(i) % 5] for d, i in zip(digests, ids)],
            }
        )

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        derive, batch_format="pandas"
    )
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, ["doc_id"])
        return tv(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


VAL_HEX_LENGTH_SQL = """
WITH d AS (
  SELECT doc_id,
         substr(md5(text), 1, CAST(8 + doc_id % 3 AS INTEGER)) AS hexcol,
         substr(md5(text), 1, CAST(8 + doc_id % 5 AS INTEGER)) AS b64col
  FROM documents
), l AS (
  SELECT doc_id,
         CASE WHEN length(hexcol) % 2 = 0 THEN length(hexcol) / 2 END AS hex_octets,
         CASE WHEN length(b64col) % 4 = 0 THEN length(b64col) / 4 * 3 END AS b64_octets
  FROM d
)
SELECT doc_id, 'hexcol.length(4,hex)' AS constraint_name, 'hexcol' AS col_name
FROM l WHERE hex_octets IS NULL OR hex_octets <> 4
UNION ALL
SELECT doc_id, 'b64col.minLength(4,base64)', 'b64col'
FROM l WHERE b64_octets IS NULL OR b64_octets < 4
UNION ALL
SELECT doc_id, 'b64col.maxLength(6,base64)', 'b64col'
FROM l WHERE b64_octets IS NULL OR b64_octets > 6
"""


# -- lexical-form facets: union, whiteSpace, digits, explicitTimezone -----


def val_lexical_forms(sf_dir: str):
    """One query through the remaining simple-type facet families
    (reference ``facets.py:96-129,401-455,458-487``,
    ``simple_types.py:879-930``):

    * ``UnionFacets`` — ``event_type`` valid if in {click, view} OR
      matching ``s.*`` (ordered-coalesce member validity);
    * ``WhiteSpace(collapse)`` — a derived column with a deterministic
      leading space every 7th event;
    * ``TotalDigits(2)`` — significant digits of ``user_id`` (int lexical
      form, exact in any engine);
    * ``FractionDigits(2)`` — over ``q = (user_id % 1000) / 8.0``: eighths
      have exact shortest-repr decimals, so Python and DuckDB print the
      same lexical form;
    * ``ExplicitTimezone(required)`` — the spec DECLARES a tz-aware
      timestamp but the data arrives tz-naive (schema drift), so the
      row-level check flags every non-null row — the runtime complement
      of the compile-time lint that rejects a statically-wrong spec.
    """
    spec = TableConstraints(
        name="lexical_checks",
        columns=[
            ColumnSpec("event_id", pa.int64()),
            ColumnSpec(
                "ts",
                pa.timestamp("us", tz="UTC"),
                facets=(F.ExplicitTimezone("required"),),
            ),
            ColumnSpec(
                "event_type",
                pa.string(),
                facets=(
                    F.UnionFacets(
                        ((F.Enumeration(("click", "view")),), (F.Pattern("s.*"),))
                    ),
                ),
            ),
            ColumnSpec("event_type_padded", pa.string(), facets=(F.WhiteSpace("collapse"),)),
            ColumnSpec("user_id", pa.int64(), facets=(F.TotalDigits(2),)),
            ColumnSpec("q", pa.float64(), facets=(F.FractionDigits(2),)),
        ],
        key_columns=("event_id",),
    )

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        et = batch["event_type"].astype(str)
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts": batch["ts"],
                "event_type": et,
                "event_type_padded": np.where(ids % 7 == 0, " " + et, et),
                "user_id": batch["user_id"],
                "q": (batch["user_id"].to_numpy() % 1000) / 8.0,
            }
        )

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "ts", "event_type", "user_id"]
    ).map_batches(derive, batch_format="pandas")
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, ["event_id"])
        return tv(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


VAL_LEXICAL_SQL = """
SELECT event_id, 'ts.explicitTimezone(required)' AS constraint_name, 'ts' AS col_name
FROM events WHERE ts IS NOT NULL
UNION ALL
SELECT event_id,
       'event_type.union[enumeration([''click'', ''view''])|pattern(''s.*'')]',
       'event_type'
FROM events
WHERE NOT (event_type IN ('click', 'view') OR regexp_matches(event_type, '^(s.*)$'))
UNION ALL
SELECT event_id, 'event_type_padded.whiteSpace(collapse)', 'event_type_padded'
FROM events WHERE event_id % 7 = 0
UNION ALL
SELECT event_id, 'user_id.totalDigits(2)', 'user_id'
FROM events WHERE length(trim(CAST(user_id AS VARCHAR), '0')) > 2
UNION ALL
SELECT event_id, 'q.fractionDigits(2)', 'q'
FROM events
WHERE length(split_part(trim(CAST((user_id % 1000) / 8.0 AS VARCHAR), '0'), '.', 2)) > 2
"""


# -- composed occurs group: ParticleCounter interval over list columns ----


def val_group_occurs(sf_dir: str):
    """Composed content-model occurs check (reference ``helpers.py:224-254``
    ParticleCounter arithmetic, ``groups.py`` ModelGroup composition):
    ``sequence(title_words[1,3], choice(tags[0,2], refs[1,4])[1,2])``
    derives bounds (1, 11) at COMPILE time; the scan checks the summed
    list lengths against those two constants. List lengths are derived
    deterministically from ``doc_id`` (contents are irrelevant to occurs),
    and the SQL oracle re-derives the same lengths — so a regression in
    the interval arithmetic breaks the hash match."""
    from xmlschema_ray.constraints.occurs import ContentGroup, Particle, group_occurs_check

    group = ContentGroup(
        "sequence",
        (
            Particle("title_words", min_occurs=1, max_occurs=3),
            ContentGroup(
                "choice",
                (Particle("tags", 0, 2), Particle("refs", 1, 4)),
                min_occurs=1,
                max_occurs=2,
            ),
        ),
    )
    spec = TableConstraints(
        name="occurs_checks",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("title_words", pa.list_(pa.int64())),
            ColumnSpec("tags", pa.list_(pa.int64())),
            ColumnSpec("refs", pa.list_(pa.int64())),
        ],
        key_columns=("doc_id",),
        row_checks=(group_occurs_check(group, name="doc_parts_occurs"),),
    )

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)

        def lists_of(lengths: np.ndarray) -> pa.ListArray:
            offsets = np.concatenate([[0], np.cumsum(lengths)])
            values = np.concatenate([np.arange(n) for n in lengths]) if lengths.sum() else np.array([], dtype=np.int64)
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int64())
            )

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "title_words": lists_of(ids % 4),
                "tags": lists_of(ids % 5),
                "refs": lists_of(ids % 9),
            }
        )

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id"]).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, ["doc_id"])
        return tv(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


VAL_GROUP_OCCURS_SQL = """
SELECT doc_id, 'doc_parts_occurs' AS constraint_name, 'title_words' AS col_name
FROM documents
WHERE NOT ((doc_id % 4 + doc_id % 5 + doc_id % 9) BETWEEN 1 AND 11)
"""


# -- referential: events.user_id ⊆ active customers (broadcast anti-join) -


def val_events_fk(sf_dir: str, distributed_threshold_bytes: "int | None" = None):
    """Keyref-style check against a RESTRICTED dimension (customers with
    positive balance) so the clean testdata yields nonzero violations —
    find-the-violations anti-join direction of ``identities.py:298-318``.
    The dim key set broadcasts only under the byte gate; past it the keys
    stay a Dataset through one co-partitioning exchange (the stage-B2
    shape). Forced-threshold-0 equivalence pinned in
    ``tests/test_distributed_paths.py``."""
    import os

    from xmlschema_ray.ops.relational import semi_join_copartitioned

    if distributed_threshold_bytes is None:
        from xmlschema_ray.pipelines.relational import DISTRIBUTED_THRESHOLD_BYTES

        distributed_threshold_bytes = DISTRIBUTED_THRESHOLD_BYTES
    active = rd.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"]
    ).filter(expr="c_acctbal > 0")
    ev = rd.read_parquet(table_path(sf_dir, "events"), columns=["event_id", "user_id"])
    if os.path.getsize(table_path(sf_dir, "customer")) <= distributed_threshold_bytes:
        bad = anti_join(ev, active.unique("c_custkey"), on="user_id")
    else:
        bad = semi_join_copartitioned(
            ev, active.select_columns(["c_custkey"]), "user_id", "c_custkey",
            keep_members=False,
        )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "constraint_name": pa.array(["fk_user_id_refs_active_customer"] * batch.num_rows),
            }
        )

    return bad.map_batches(shape, batch_format="pyarrow")


VAL_EVENTS_FK_SQL = """
SELECT event_id, user_id, 'fk_user_id_refs_active_customer' AS constraint_name
FROM events WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
"""


# -- stats profile: exact min/max/count/nulls/mean over lineitem ----------


def stats_profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """The stats channel cross-checked against SQL: exact extremes, counts
    and an integer-sum mean (order-independent ⇒ oracle-exact)."""
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": [1],
                "n": [len(batch)],
                "min_qty": [batch["l_quantity"].min()],
                "max_qty": [batch["l_quantity"].max()],
                "min_price": [batch["l_extendedprice"].min()],
                "max_price": [batch["l_extendedprice"].max()],
                "sum_qty": [int(batch["l_quantity"].astype("int64").sum())],
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Min("min_qty", alias_name="min_qty"),
            Max("max_qty", alias_name="max_qty"),
            Min("min_price", alias_name="min_price"),
            Max("max_price", alias_name="max_price"),
            Sum("sum_qty", alias_name="sum_qty"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_rows": agg["n_rows"].astype("int64"),
            "min_qty": agg["min_qty"],
            "max_qty": agg["max_qty"],
            "min_price": agg["min_price"],
            "max_price": agg["max_price"],
            "mean_qty": agg["sum_qty"] / agg["n_rows"],
        }
    )
    return out


STATS_PROFILE_SQL = """
SELECT COUNT(*) AS n_rows,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS mean_qty
FROM lineitem
"""


def val_conditional_types(sf_dir: str):
    """XSD 1.1 conditional type assignment (``xs:alternative``,
    reference ``validators/elements.py:758-857``): the ``value`` column's
    declared type [0.1, 300] validates EVERY row (alternatives are
    restrictions, so they inherit it); purchases additionally validate
    against [2, 250] and errors against [0.5, 150]. Each alternative stack is verified at
    compile time to be a valid restriction of the declared type (the
    ``is_derived`` check), and per-row dispatch is one Arrow kernel per
    case — same single streaming pass as every other facet."""
    from xmlschema_ray.constraints.spec import AltCase, TypeAlternatives

    spec = TableConstraints(
        name="events_conditional",
        columns=[
            ColumnSpec("event_id", pa.int64()),
            ColumnSpec("event_type", pa.string()),
            ColumnSpec(
                "value",
                pa.float64(),
                facets=(F.MinInclusive(0.1), F.MaxInclusive(300.0)),
            ),
        ],
        type_alternatives=[
            TypeAlternatives(
                column="value",
                cases=(
                    AltCase(
                        column="event_type",
                        op="==",
                        value="purchase",
                        facets=(F.MinInclusive(2.0), F.MaxInclusive(250.0)),
                        type_name="purchase_value",
                    ),
                    AltCase(
                        column="event_type",
                        op="==",
                        value="error",
                        facets=(F.MinInclusive(0.5), F.MaxInclusive(150.0)),
                        type_name="error_value",
                    ),
                ),
            )
        ],
        key_columns=("event_id",),
    )
    return _run_typed(
        sf_dir, "events", spec, ["event_id"], ["event_id", "event_type", "value"]
    )


VAL_CONDITIONAL_SQL = """
SELECT event_id, 'value.minInclusive(0.1)' AS constraint_name, 'value' AS col_name
FROM events WHERE NOT (value >= 0.1)
UNION ALL
SELECT event_id, 'value.maxInclusive(300.0)', 'value'
FROM events WHERE NOT (value <= 300.0)
UNION ALL
SELECT event_id, 'value.alt[purchase_value].minInclusive(2.0)', 'value'
FROM events WHERE event_type = 'purchase' AND NOT (value >= 2.0)
UNION ALL
SELECT event_id, 'value.alt[purchase_value].maxInclusive(250.0)', 'value'
FROM events WHERE event_type = 'purchase' AND NOT (value <= 250.0)
UNION ALL
SELECT event_id, 'value.alt[error_value].minInclusive(0.5)', 'value'
FROM events WHERE event_type = 'error' AND NOT (value >= 0.5)
UNION ALL
SELECT event_id, 'value.alt[error_value].maxInclusive(150.0)', 'value'
FROM events WHERE event_type = 'error' AND NOT (value <= 150.0)
"""


# -- violation triage (the error report a human reads) -----------------------


def triage_violations(
    violations: "rd.Dataset", key_cols: List[str], n_examples: int = 3
) -> pd.DataFrame:
    """Per-constraint triage of a violations stream: total count plus the
    ``n_examples`` SMALLEST offending keys — the report a data engineer
    actually reads when a run goes red, and the reason violation identity
    is key-based (stable examples at any parallelism; a row index would
    name different rows per run).

    Per-batch partial: one row per (constraint, column) carrying a count,
    that batch's ``n_examples`` smallest INTEGER keys, and an explicit
    real-example count ``n_ex`` — pad slots hold ``-1`` so the export
    stays non-null int64 (the DuckDB nullable-BIGINT→float64 trap), and
    the merge trusts ``n_ex``, never the sentinel value, so a corpus
    whose genuine smallest key IS ``-1`` still merges exactly (only the
    final output's pad slots remain ``-1``, matching the oracle's
    ``COALESCE(..., -1)``). Count-sum and min-k-merge are both
    associative, so the driver merge over ``#constraints × #blocks``
    partial rows is exact and metadata-sized at any corpus size.
    Integer key columns only (string keys would need a different pad
    convention) — non-integer keys raise rather than mis-cast.
    """
    pad = [-1] * len(key_cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        for kc in key_cols:
            if not pd.api.types.is_integer_dtype(batch[kc]):
                raise TypeError(
                    f"triage_violations: key column {kc!r} is "
                    f"{batch[kc].dtype} — integer key columns only"
                )
        rows = []
        for (cname, col), g in batch.groupby(["constraint_name", "col_name"], sort=False):
            ex = g[key_cols].sort_values(key_cols, kind="mergesort").head(n_examples)
            vals = ex.to_numpy().tolist()
            n_real = len(vals)
            while len(vals) < n_examples:
                vals.append(pad)
            row = {
                "constraint_name": cname,
                "col_name": col,
                "n": np.int64(len(g)),
                "n_ex": np.int64(n_real),
            }
            for i, v in enumerate(vals, 1):
                for k, kc in enumerate(key_cols):
                    row[f"ex{i}_{kc}"] = np.int64(v[k])
            rows.append(row)
        cols = ["constraint_name", "col_name", "n", "n_ex"] + [
            f"ex{i}_{kc}" for i in range(1, n_examples + 1) for kc in key_cols
        ]
        return pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
            {c: pd.Series([], dtype=object if c in ("constraint_name", "col_name") else "int64") for c in cols}
        )

    parts = violations.map_batches(partial, batch_format="pandas").to_pandas()
    out_rows = []
    for (cname, col), g in parts.groupby(["constraint_name", "col_name"], sort=True):
        # explode each partial's example block back to key tuples — the
        # first n_ex slots per partial row are real, the rest are pads —
        # and take the n_examples smallest of the union (min-k merge)
        n_real = g["n_ex"].to_numpy(np.int64)
        exs = []
        for i in range(1, n_examples + 1):
            cols_i = [f"ex{i}_{kc}" for kc in key_cols]
            e = g[cols_i].to_numpy()
            exs.append(e[n_real >= i])
        allex = np.concatenate(exs) if exs else np.empty((0, len(key_cols)))
        order = np.lexsort(tuple(allex[:, k] for k in reversed(range(len(key_cols)))))
        allex = allex[order][:n_examples]
        row = {"constraint_name": cname, "col_name": col, "n": np.int64(g["n"].sum())}
        for i in range(1, n_examples + 1):
            for k, kc in enumerate(key_cols):
                row[f"ex{i}_{kc}"] = np.int64(allex[i - 1][k]) if i <= len(allex) else np.int64(-1)
        out_rows.append(row)
    return pd.DataFrame(out_rows).reset_index(drop=True)


def val_triage_lineitem(sf_dir: str) -> pd.DataFrame:
    """:func:`triage_violations` over the ``val_lineitem_ranges``
    violation stream — counts plus 3 smallest offending keys per facet."""
    return triage_violations(
        val_lineitem_ranges(sf_dir), ["l_orderkey", "l_linenumber"]
    )


VAL_TRIAGE_SQL = f"""
WITH v AS ({VAL_LINEITEM_SQL}
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY constraint_name, col_name ORDER BY l_orderkey, l_linenumber
  ) AS rk FROM v
)
SELECT constraint_name, col_name, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COALESCE(MAX(CASE WHEN rk = 1 THEN l_orderkey END), -1) AS BIGINT) AS ex1_l_orderkey,
  CAST(COALESCE(MAX(CASE WHEN rk = 1 THEN l_linenumber END), -1) AS BIGINT) AS ex1_l_linenumber,
  CAST(COALESCE(MAX(CASE WHEN rk = 2 THEN l_orderkey END), -1) AS BIGINT) AS ex2_l_orderkey,
  CAST(COALESCE(MAX(CASE WHEN rk = 2 THEN l_linenumber END), -1) AS BIGINT) AS ex2_l_linenumber,
  CAST(COALESCE(MAX(CASE WHEN rk = 3 THEN l_orderkey END), -1) AS BIGINT) AS ex3_l_orderkey,
  CAST(COALESCE(MAX(CASE WHEN rk = 3 THEN l_linenumber END), -1) AS BIGINT) AS ex3_l_linenumber
FROM r GROUP BY constraint_name, col_name
ORDER BY constraint_name
"""


ORACLES: Dict[str, str] = {
    "val_lineitem_ranges": VAL_LINEITEM_SQL,
    "val_triage_lineitem": VAL_TRIAGE_SQL,
    "val_events_enum": VAL_EVENTS_ENUM_SQL,
    "val_documents": VAL_DOCUMENTS_SQL,
    "val_nested_struct": VAL_NESTED_STRUCT_SQL,
    "val_hex_length": VAL_HEX_LENGTH_SQL,
    "val_lexical_forms": VAL_LEXICAL_SQL,
    "val_group_occurs": VAL_GROUP_OCCURS_SQL,
    "val_conditional_types": VAL_CONDITIONAL_SQL,
    "val_events_fk": VAL_EVENTS_FK_SQL,
    "stats_profile_lineitem": STATS_PROFILE_SQL,
}

QUERIES = {
    "val_lineitem_ranges": val_lineitem_ranges,
    "val_triage_lineitem": val_triage_lineitem,
    "val_events_enum": val_events_enum,
    "val_documents": val_documents,
    "val_nested_struct": val_nested_struct,
    "val_hex_length": val_hex_length,
    "val_lexical_forms": val_lexical_forms,
    "val_group_occurs": val_group_occurs,
    "val_conditional_types": val_conditional_types,
    "val_events_fk": val_events_fk,
    "stats_profile_lineitem": stats_profile_lineitem,
}
