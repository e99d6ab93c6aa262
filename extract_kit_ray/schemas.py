"""pyarrow schemas + JSON-Schema compiler + validator — the Zod-equivalent.

Re-expresses the reference's dynamic Zod schema system
(packages/pdf-processor/src/core/schemas/{base,invoice,tables,factory}.ts
and src/core/vision/schema-selector.ts) as fixed pyarrow types selected at
plan time (SURVEY.md §1.2): nested structs with all-nullable leaves, lists
of structs, ``pa.map_`` for ``z.record``, and tagged-string cells for the
string|number|null table-cell union (Arrow dense unions don't round-trip
Parquet well — SURVEY.md §7.4 hard-part 2).

Validation failure is data, never an exception
(reference contract: processor.ts:115-131).
"""

from __future__ import annotations

import json
import re
from typing import Any

import pyarrow as pa

# ---------------------------------------------------------------------------
# pipeline table schemas
# ---------------------------------------------------------------------------

#: the BASELINE input_hint table of Common-Crawl-style pages
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())]
)

META_TYPE = pa.struct(
    [
        ("n_pages", pa.int32()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
        ("parse_ms", pa.float64()),
    ]
)

#: flagship extraction output (FIXTURES.md §2)
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("domain", pa.string()),
        ("doc_kind", pa.string()),
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("valid", pa.bool_()),
        ("errors", pa.list_(pa.string())),
        ("meta", META_TYPE),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("n_docs", pa.int64()),
        ("n_valid", pa.int64()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
        ("mean_parse_ms", pa.float64()),
    ]
)

# ---------------------------------------------------------------------------
# structured-extraction presets (ports of the reference Zod schemas; every
# leaf nullable, mirroring .nullable().optional() throughout base.ts)
# ---------------------------------------------------------------------------

ADDRESS_TYPE = pa.struct(  # base.ts:7-12
    [
        ("street", pa.string()),
        ("city", pa.string()),
        ("postal_code", pa.string()),
        ("country", pa.string()),
    ]
)

CONTACT_INFO_TYPE = pa.struct(  # base.ts:14-23
    [
        ("name", pa.string()),
        ("company_name", pa.string()),
        ("address", ADDRESS_TYPE),
        ("phone", pa.string()),
        ("email", pa.string()),
        ("website", pa.string()),
        ("vat_number", pa.string()),
        ("tax_id", pa.string()),
    ]
)

DOCUMENT_INFO_TYPE = pa.struct(  # base.ts:25-30
    [
        ("document_type", pa.string()),
        ("language", pa.string()),
        ("currency", pa.string()),
        ("total_pages", pa.int64()),
    ]
)

PAYMENT_INFO_TYPE = pa.struct(  # base.ts:32-39
    [
        ("payment_terms", pa.string()),
        ("payment_method", pa.string()),
        ("payment_due_date", pa.string()),
        ("bank_details", pa.string()),
        ("iban", pa.string()),
        ("swift_code", pa.string()),
    ]
)

INVOICE_LINE_ITEM_TYPE = pa.struct(  # invoice.ts:8-27 (bilingual EN/FR fields)
    [
        ("item_number", pa.string()),
        ("description", pa.string()),
        ("quantity", pa.float64()),
        ("unit", pa.string()),
        ("unit_price", pa.float64()),
        ("discount", pa.float64()),
        ("tax_rate", pa.float64()),
        ("tax_amount", pa.float64()),
        ("line_total", pa.float64()),
        ("quantite", pa.float64()),
        ("prix_unitaire", pa.float64()),
        ("montant_ht", pa.float64()),
        ("montant_ttc", pa.float64()),
        ("taux_tva", pa.float64()),
        ("montant_tva", pa.float64()),
        ("currency", pa.string()),
    ]
)

FINANCIAL_TOTALS_TYPE = pa.struct(  # invoice.ts:29-46
    [
        ("subtotal", pa.float64()),
        ("discount_total", pa.float64()),
        ("tax_total", pa.float64()),
        ("shipping_cost", pa.float64()),
        ("total_amount", pa.float64()),
        ("amount_paid", pa.float64()),
        ("balance_due", pa.float64()),
        ("total_ht", pa.float64()),
        ("total_tva", pa.float64()),
        ("total_ttc", pa.float64()),
        ("montant_ht", pa.float64()),
        ("montant_tva", pa.float64()),
        ("montant_ttc", pa.float64()),
        ("currency", pa.string()),
    ]
)

INVOICE_DETAILS_TYPE = pa.struct(  # invoice.ts:48-54
    [
        ("invoice_number", pa.string()),
        ("invoice_date", pa.string()),
        ("due_date", pa.string()),
        ("purchase_order", pa.string()),
        ("reference_number", pa.string()),
    ]
)

_SECTION_ITEM_TYPE = pa.struct(  # invoice.ts:79-86
    [
        ("quantite", pa.float64()),
        ("prix_unitaire", pa.float64()),
        ("montant_ht", pa.float64()),
        ("taux_tva", pa.float64()),
        ("montant_tva", pa.float64()),
        ("montant_ttc", pa.float64()),
    ]
)

_SECTION_TYPE = pa.struct(  # invoice.ts:78-88
    [
        ("items", pa.map_(pa.string(), _SECTION_ITEM_TYPE)),
        ("sous_total", FINANCIAL_TOTALS_TYPE),
    ]
)

PAGE_TABLE_TYPE = pa.struct(  # invoice.ts:70-99; raw_data (z.record(z.any()))
    [  # is a JSON-encoded string (SURVEY.md §1.2 pragmatic union handling)
        ("billed_services", pa.list_(INVOICE_LINE_ITEM_TYPE)),
        ("totals", FINANCIAL_TOTALS_TYPE),
        ("sections_detaillees", pa.map_(pa.string(), _SECTION_TYPE)),
        ("total", FINANCIAL_TOTALS_TYPE),
        ("reference", pa.string()),
        ("exercice", pa.string()),
        ("montant_ttc", pa.float64()),
        ("currency", pa.string()),
        ("raw_data", pa.string()),
    ]
)

EXTRACTION_METADATA_TYPE = pa.struct(  # invoice.ts:102-107
    [
        ("confidence_score", pa.float64()),
        ("fields_found", pa.int64()),
        ("fields_empty", pa.int64()),
        ("processing_notes", pa.list_(pa.string())),
    ]
)

COMPREHENSIVE_INVOICE_TYPE = pa.struct(  # invoice.ts:57-108
    [
        ("document_info", DOCUMENT_INFO_TYPE),
        ("invoice_details", INVOICE_DETAILS_TYPE),
        ("seller_info", CONTACT_INFO_TYPE),
        ("buyer_info", CONTACT_INFO_TYPE),
        ("line_items", pa.list_(INVOICE_LINE_ITEM_TYPE)),
        ("financial_totals", FINANCIAL_TOTALS_TYPE),
        ("payment_info", PAYMENT_INFO_TYPE),
        (
            "pages",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.float64()),
                        ("page_tables", pa.list_(PAGE_TABLE_TYPE)),
                    ]
                )
            ),
        ),
        ("extraction_metadata", EXTRACTION_METADATA_TYPE),
    ]
)

RECEIPT_ITEM_TYPE = pa.struct(  # invoice.ts:117-122
    [
        ("name", pa.string()),
        ("price", pa.float64()),
        ("quantity", pa.float64()),
        ("total", pa.float64()),
    ]
)

BASIC_RECEIPT_TYPE = pa.struct(  # invoice.ts:111-123
    [
        ("merchant_name", pa.string()),
        ("transaction_date", pa.string()),
        ("total_amount", pa.float64()),
        ("payment_method", pa.string()),
        ("currency", pa.string()),
        ("items", pa.list_(RECEIPT_ITEM_TYPE)),
    ]
)

# table cells: z.union([string, number, null]) (tables.ts:7-9) becomes a
# tagged string: cell_type 0=null, 1=string, 2=number (SURVEY.md §7.4)
TABLE_CELL_TYPE = pa.struct([("value", pa.string()), ("cell_type", pa.int8())])

DETECTED_TABLE_TYPE = pa.struct(  # tables.ts:11-17
    [
        ("table_name", pa.string()),
        ("table_type", pa.string()),
        ("headers", pa.list_(pa.string())),
        ("rows", pa.list_(pa.list_(TABLE_CELL_TYPE))),
        ("summary", pa.string()),
    ]
)

TABLES_ONLY_TYPE = pa.struct(  # tables.ts:19-25
    [
        ("detected_tables", pa.list_(DETECTED_TABLE_TYPE)),
        (
            "extraction_metadata",
            pa.struct(
                [
                    ("tables_found", pa.int64()),
                    ("confidence_score", pa.float64()),
                ]
            ),
        ),
    ]
)

SCHEMA_PRESETS: dict[str, pa.DataType] = {  # factory.ts:81-101
    "invoice": COMPREHENSIVE_INVOICE_TYPE,
    "receipt": BASIC_RECEIPT_TYPE,
    "tables": TABLES_ONLY_TYPE,
    "basic": COMPREHENSIVE_INVOICE_TYPE,
    "simple": COMPREHENSIVE_INVOICE_TYPE,
}

# ---------------------------------------------------------------------------
# JSON-Schema -> pyarrow compiler (factory.ts:13-76, same recursion)
# ---------------------------------------------------------------------------


def compile_json_schema(json_schema: str | dict) -> pa.DataType:
    """Compile a JSON-Schema (string or dict) to a pyarrow type.

    Mirrors SchemaFactory.createFromJSON/convertJSONSchemaToZod: objects ->
    structs, arrays -> lists, ``["T", "null"]`` unions -> nullable T (all
    Arrow fields are nullable anyway), primitives -> string/float64/int64/
    bool, anything unrecognized -> string (JSON-encoded ``z.any`` analog).
    Raises ``ValueError`` on unparseable JSON (factory.ts:17-19).
    """
    if isinstance(json_schema, str):
        try:
            parsed = json.loads(json_schema)
        except json.JSONDecodeError as exc:
            raise ValueError(f"Invalid JSON schema: {exc}") from exc
    else:
        parsed = json_schema
    return _convert_schema(parsed)


def _convert_schema(node: Any) -> pa.DataType:
    if isinstance(node, dict) and node.get("type") == "object" and node.get("properties"):
        fields = [(k, _convert_property(v)) for k, v in node["properties"].items()]
        return pa.struct(fields)
    return pa.string()  # z.any() fallback (factory.ts:36)


def _convert_property(prop: Any) -> pa.DataType:
    if not isinstance(prop, dict):
        return pa.string()
    ptype = prop.get("type")
    if isinstance(ptype, list):
        if "null" in ptype:
            non_null = next((t for t in ptype if t != "null"), None)
            return _primitive_type(non_null)
    if ptype == "array" and prop.get("items"):
        return pa.list_(_convert_property(prop["items"]))
    if ptype == "object" and prop.get("properties"):
        return _convert_schema(prop)
    return _primitive_type(ptype)


def _primitive_type(type_name: Any) -> pa.DataType:
    return {
        "string": pa.string(),
        "number": pa.float64(),
        "integer": pa.int64(),
        "boolean": pa.bool_(),
        "array": pa.list_(pa.string()),
        "object": pa.struct([]),
    }.get(type_name, pa.string())


# ---------------------------------------------------------------------------
# schema selection (schema-selector.ts:20-58, same priority order)
# ---------------------------------------------------------------------------


def select_schema(
    custom_schema: pa.DataType | None = None,
    tables_only: bool = False,
    document_type: str | None = None,
    json_query: str | None = None,
) -> tuple[pa.DataType, str]:
    """Priority: custom -> tablesOnly -> documentType preset -> JSON-Schema
    query -> comprehensive default. Returns (type, schema_name)."""
    if custom_schema is not None:
        return custom_schema, "custom"
    if tables_only:
        return TABLES_ONLY_TYPE, "tables_only"
    if document_type:
        preset = SCHEMA_PRESETS.get(document_type.lower(), COMPREHENSIVE_INVOICE_TYPE)
        return preset, f"document_type:{document_type.lower()}"
    if json_query:
        try:
            json.loads(json_query)  # validity probe (schema-selector.ts:60-67)
            return compile_json_schema(json_query), "json_query"
        except (ValueError, json.JSONDecodeError):
            pass
    return COMPREHENSIVE_INVOICE_TYPE, "comprehensive_default"


# ---------------------------------------------------------------------------
# validator (the "generate+validate" V7 analog, ai-generator.ts:50-84 /
# processor.ts:115-131: errors become data)
# ---------------------------------------------------------------------------

_EMAIL_RE = re.compile(r"^[^\s@]+@[^\s@]+\.[^\s@]+$")


def _type_name(v: Any) -> str:
    return type(v).__name__


def validate_value(value: Any, patype: pa.DataType, path: str, errors: list[str]) -> Any:
    """Recursively coerce ``value`` to ``patype``; mismatches append a
    Zod-style path message and normalize to None (all leaves nullable)."""
    if value is None:
        return None
    if pa.types.is_struct(patype):
        if not isinstance(value, dict):
            errors.append(f"{path}: expected object, got {_type_name(value)}")
            return None
        out = {}
        for field in patype:
            child = value.get(field.name)
            out[field.name] = validate_value(child, field.type, f"{path}.{field.name}", errors)
        return out
    if pa.types.is_list(patype) or pa.types.is_large_list(patype):
        if not isinstance(value, (list, tuple)):
            errors.append(f"{path}: expected array, got {_type_name(value)}")
            return None
        return [
            validate_value(v, patype.value_type, f"{path}[{i}]", errors)
            for i, v in enumerate(value)
        ]
    if pa.types.is_map(patype):
        if not isinstance(value, dict):
            errors.append(f"{path}: expected record, got {_type_name(value)}")
            return None
        return [
            (str(k), validate_value(v, patype.item_type, f"{path}.{k}", errors))
            for k, v in sorted(value.items())
        ]
    if pa.types.is_integer(patype):
        if isinstance(value, bool) or not isinstance(value, int):
            if isinstance(value, float) and value.is_integer():
                return int(value)
            errors.append(f"{path}: expected integer, got {_type_name(value)}")
            return None
        return value
    if pa.types.is_floating(patype):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            errors.append(f"{path}: expected number, got {_type_name(value)}")
            return None
        return float(value)
    if pa.types.is_boolean(patype):
        if not isinstance(value, bool):
            errors.append(f"{path}: expected boolean, got {_type_name(value)}")
            return None
        return value
    if pa.types.is_string(patype) or pa.types.is_large_string(patype):
        if not isinstance(value, str):
            # raw_data / z.any analog: JSON-encode non-strings
            return json.dumps(value, sort_keys=True, ensure_ascii=False)
        return value
    errors.append(f"{path}: unsupported target type {patype}")
    return None


def _constraint_checks(value: Any, path: str, errors: list[str]) -> None:
    """Field-name-based constraints mirroring the Zod refinements:
    ``.email()`` on fields named email (base.ts:19) and ``.min(0).max(1)``
    on confidence_score (invoice.ts:103, tables.ts:23)."""
    if isinstance(value, dict):
        for k, v in value.items():
            p = f"{path}.{k}"
            if k == "email" and isinstance(v, str) and not _EMAIL_RE.match(v):
                errors.append(f"{p}: invalid email")
            if k == "confidence_score" and isinstance(v, (int, float)) and v is not None:
                if not (0.0 <= float(v) <= 1.0):
                    errors.append(f"{p}: confidence_score out of [0, 1]")
            _constraint_checks(v, p, errors)
    elif isinstance(value, (list, tuple)):
        for i, v in enumerate(value):
            _constraint_checks(v, f"{path}[{i}]", errors)


def receipt_invariant_errors(data: dict, tolerance: float = 0.01) -> list[str]:
    """Cross-field invariant from the reference's strongest test:
    ``|Σ item.total − total_amount| ≤ 0.01`` (tests/receipt.test.ts:84-85)."""
    if not isinstance(data, dict):
        return []
    items = data.get("items")
    total = data.get("total_amount")
    if not isinstance(items, list) or not isinstance(total, (int, float)):
        return []
    item_sum = sum(
        it.get("total") for it in items
        if isinstance(it, dict) and isinstance(it.get("total"), (int, float))
    )
    if abs(item_sum - total) > tolerance:
        return [f"items total {item_sum:.2f} != total_amount {float(total):.2f} (tol {tolerance})"]
    return []


def validate_record(
    candidate: Any, target: pa.DataType, *, check_receipt: bool = False
) -> tuple[Any, bool, list[str]]:
    """Validate one candidate record (dict or JSON string) against a target
    type. Returns (normalized, valid, errors) — failure is data."""
    errors: list[str] = []
    if isinstance(candidate, (str, bytes)):
        try:
            candidate = json.loads(candidate)
        except (json.JSONDecodeError, UnicodeDecodeError) as exc:
            return None, False, [f"$: invalid JSON ({exc})"]
    normalized = validate_value(candidate, target, "$", errors)
    _constraint_checks(normalized if isinstance(normalized, dict) else candidate, "$", errors)
    if check_receipt and isinstance(normalized, dict):
        errors.extend(receipt_invariant_errors(normalized))
    return normalized, not errors, errors
