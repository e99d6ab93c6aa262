"""Schema-validation stage (SURVEY.md V7): candidate JSON/struct column ->
typed struct column + valid/errors columns — the Zod ``generateObject``
validation re-expressed over Arrow batches (ai-generator.ts:50-84,
processor.ts:115-131: validation failure is data)."""

from __future__ import annotations

import pyarrow as pa

from ..schemas import validate_record


class SchemaValidator:
    """Actor-pool callable: target type resolved once per actor
    (schema selection happens at plan time, SURVEY.md §1.2)."""

    def __init__(
        self,
        target: pa.DataType,
        input_col: str = "candidate_json",
        output_col: str = "data",
        check_receipt: bool = False,
        keep_input: bool = False,
    ):
        self.target = target
        self.input_col = input_col
        self.output_col = output_col
        self.check_receipt = check_receipt
        self.keep_input = keep_input

    def __call__(self, batch: pa.Table) -> pa.Table:
        candidates = batch[self.input_col].to_pylist()
        datas, valids, errorss = [], [], []
        for cand in candidates:
            data, valid, errors = validate_record(
                cand, self.target, check_receipt=self.check_receipt
            )
            datas.append(data)
            valids.append(valid)
            errorss.append(errors)
        out = batch if self.keep_input else batch.drop_columns([self.input_col])
        return (
            out.append_column(self.output_col, pa.array(datas, self.target))
            .append_column("valid", pa.array(valids, pa.bool_()))
            .append_column("errors", pa.array(errorss, pa.list_(pa.string())))
        )
