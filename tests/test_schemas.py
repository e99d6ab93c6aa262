"""Schema system tests: JSON-Schema compiler, selection priority,
validation-as-data, receipt invariant (reference Zod parity)."""

import pyarrow as pa

from extract_kit_ray.schemas import (
    BASIC_RECEIPT_TYPE,
    COMPREHENSIVE_INVOICE_TYPE,
    TABLES_ONLY_TYPE,
    compile_json_schema,
    receipt_invariant_errors,
    select_schema,
    validate_record,
)


def test_compile_json_schema_object():
    t = compile_json_schema(
        '{"type": "object", "properties": {'
        '"name": {"type": "string"},'
        '"count": {"type": "integer"},'
        '"score": {"type": ["number", "null"]},'
        '"tags": {"type": "array", "items": {"type": "string"}},'
        '"nested": {"type": "object", "properties": {"x": {"type": "boolean"}}}}}'
    )
    assert pa.types.is_struct(t)
    by_name = {f.name: f.type for f in t}
    assert by_name["name"] == pa.string()
    assert by_name["count"] == pa.int64()
    assert by_name["score"] == pa.float64()
    assert by_name["tags"] == pa.list_(pa.string())
    assert pa.types.is_struct(by_name["nested"])


def test_compile_json_schema_invalid_raises():
    import pytest

    with pytest.raises(ValueError):
        compile_json_schema("{not json")


def test_select_schema_priority():
    # priority: custom -> tables_only -> document_type -> json -> default
    # (schema-selector.ts:20-58)
    custom = pa.struct([("a", pa.string())])
    assert select_schema(custom_schema=custom)[1] == "custom"
    assert select_schema(tables_only=True)[0] == TABLES_ONLY_TYPE
    t, name = select_schema(document_type="receipt")
    assert t == BASIC_RECEIPT_TYPE and name == "document_type:receipt"
    assert select_schema(document_type="unknown_kind")[0] == COMPREHENSIVE_INVOICE_TYPE
    assert select_schema(json_query='{"type":"object","properties":{"x":{"type":"string"}}}')[1] == "json_query"
    assert select_schema()[1] == "comprehensive_default"


def test_validate_receipt_ok():
    rec = {
        "merchant_name": "Shop",
        "transaction_date": "2024-01-01",
        "total_amount": 3.5,
        "currency": "EUR",
        "items": [
            {"name": "a", "price": 1.0, "quantity": 1, "total": 1.0},
            {"name": "b", "price": 2.5, "quantity": 1, "total": 2.5},
        ],
    }
    data, valid, errors = validate_record(rec, BASIC_RECEIPT_TYPE, check_receipt=True)
    assert valid and errors == []
    # result must be constructible as an Arrow struct
    arr = pa.array([data], BASIC_RECEIPT_TYPE)
    assert arr[0]["merchant_name"].as_py() == "Shop"


def test_validate_type_mismatch_is_data_not_exception():
    rec = {"merchant_name": 42, "total_amount": "oops", "items": "not-a-list"}
    data, valid, errors = validate_record(rec, BASIC_RECEIPT_TYPE)
    assert not valid
    joined = " ".join(errors)
    assert "$.total_amount" in joined and "$.items" in joined
    # merchant_name: non-string is JSON-coerced (z.any analog for strings)
    assert data["merchant_name"] == "42"


def test_validate_invalid_json_string():
    data, valid, errors = validate_record("{broken", BASIC_RECEIPT_TYPE)
    assert data is None and not valid and "invalid JSON" in errors[0]


def test_receipt_invariant_mirrors_reference_test():
    # |Σ item.total − total_amount| ≤ 0.01 (tests/receipt.test.ts:84-85)
    ok = {"total_amount": 3.0, "items": [{"total": 1.5}, {"total": 1.505}]}
    assert receipt_invariant_errors(ok) == []
    bad = {"total_amount": 3.0, "items": [{"total": 1.0}, {"total": 1.0}]}
    assert len(receipt_invariant_errors(bad)) == 1


def test_email_and_confidence_constraints():
    rec = {"seller_info": {"email": "not-an-email"},
           "extraction_metadata": {"confidence_score": 1.5}}
    _, valid, errors = validate_record(rec, COMPREHENSIVE_INVOICE_TYPE)
    assert not valid
    joined = " ".join(errors)
    assert "invalid email" in joined and "confidence_score" in joined
    rec_ok = {"seller_info": {"email": "a@b.co"},
              "extraction_metadata": {"confidence_score": 0.9}}
    _, valid_ok, _ = validate_record(rec_ok, COMPREHENSIVE_INVOICE_TYPE)
    assert valid_ok


def test_comprehensive_invoice_nested_pages_and_maps():
    rec = {
        "document_info": {"document_type": "invoice", "total_pages": 2},
        "pages": [
            {
                "page": 1,
                "page_tables": [
                    {
                        "billed_services": [{"description": "svc", "line_total": 10.0}],
                        "sections_detaillees": {
                            "sec1": {
                                "items": {"item1": {"quantite": 2.0, "montant_ht": 5.0}},
                                "sous_total": {"total_ht": 10.0},
                            }
                        },
                        "raw_data": {"free": ["form", 1]},
                    }
                ],
            }
        ],
    }
    data, valid, errors = validate_record(rec, COMPREHENSIVE_INVOICE_TYPE)
    assert valid, errors
    arr = pa.array([data], COMPREHENSIVE_INVOICE_TYPE)
    page_tables = arr[0]["pages"][0]["page_tables"]
    assert page_tables[0]["billed_services"][0]["description"].as_py() == "svc"
    # z.record -> map type
    sections = page_tables[0]["sections_detaillees"].as_py()
    assert sections[0][0] == "sec1"
    # z.record(z.any()) -> JSON-encoded string
    assert page_tables[0]["raw_data"].as_py() == '{"free": ["form", 1]}'


def test_tables_union_cells_tagged_string():
    from extract_kit_ray.schemas import TABLE_CELL_TYPE

    cells = [
        {"value": None, "cell_type": 0},
        {"value": "text", "cell_type": 1},
        {"value": "3.14", "cell_type": 2},
    ]
    arr = pa.array([cells], pa.list_(TABLE_CELL_TYPE))
    assert arr[0][2]["cell_type"].as_py() == 2
