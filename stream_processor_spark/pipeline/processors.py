"""Processor registry: named record transformations/filters + chains.

Reference model: processors are arbitrary JS modules in
``src/transformations/`` and ``src/filters/``, registered in the catalog by
filename with an ``is_filter`` flag (scripts/pipelines/pull_processors.js:
29-40, 53-66) and require()'d by name per pipeline step
(src/consumer.js:90-91). Filters drop a record by returning null
(src/filters/isEven.js:2).

Engine model — two processor kinds, fastest-first:

1. **Expression processors** (preferred): a factory ``cols -> dict`` of
   replacement Column expressions (transform) or ``cols -> Column``
   predicate (filter). These compile into the Catalyst plan (whole-stage
   codegen, zero Python). The four reference transformations + isEven ship
   as builtins.
2. **Python processors**: an arbitrary ``dict -> dict | None`` record
   function (the reference's actual contract). Chains of these run inside
   ONE Arrow-batched ``mapInPandas`` pass that applies the whole chain
   per record, catches exceptions, and emits the same ``route`` column the
   expression path produces — failures become data, not task aborts
   (SURVEY.md §4 custom item 2). Python-processor chains cost one
   JVM→Python round-trip per batch regardless of chain length.

Dynamic discovery mirrors pull_processors.js: ``discover_directory`` scans
``<dir>/transformations/*.py`` and ``<dir>/filters/*.py``, importing each
module's ``process`` callable under its filename.
"""

from __future__ import annotations

import importlib.util
import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from numbers import Integral, Real

import pandas as pd

from pyspark.sql import Column, DataFrame

from stream_processor_spark.operators.dlq import ROUTE_DROPPED, ROUTE_OK, Step, apply_chain

_INT_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})


def _coerce_out(v, dtype: str) -> tuple[bool, object]:
    """Validate/coerce one processor output value against a Spark type.

    User record_fns are JS-untyped (the reference's processors return
    whatever they like, consumer.js:142-145 catches per message) — a
    wrong-typed out value must become a routed error, never an Arrow
    conversion crash that aborts the task (a poison-pill restart loop in
    streaming). Returns ``(ok, coerced)``; numpy scalars count as their
    abstract numeric type (Integral/Real), bools never count as numbers.
    """
    if v is None:
        return True, None
    if dtype in _INT_TYPES:
        if isinstance(v, bool):
            return False, None
        if isinstance(v, Integral):
            return True, int(v)
        if isinstance(v, Real) and float(v).is_integer():
            return True, int(v)
        return False, None
    if dtype in ("float", "double"):
        if isinstance(v, bool) or not isinstance(v, Real):
            return False, None
        return True, float(v)
    if dtype == "string":
        return (True, str(v)) if isinstance(v, str) else (False, None)
    if dtype == "boolean":
        return (True, bool(v)) if isinstance(v, bool) else (False, None)
    if dtype == "timestamp":
        import datetime

        return (True, v) if isinstance(v, datetime.datetime) else (False, None)
    if dtype == "date":
        import datetime

        if isinstance(v, datetime.datetime):
            return False, None  # date column: datetime would silently truncate
        return (True, v) if isinstance(v, datetime.date) else (False, None)
    # remaining nested types (array, struct, map, binary): pass through —
    # Arrow's conversion accepts lists/dicts/bytes or raises per batch
    return True, v

RecordFn = Callable[[dict], dict | None]


@dataclass
class Processor:
    name: str
    is_filter: bool = False
    # expression form
    expr_transform: Callable[[dict], dict] | None = None
    expr_fail_when: Callable[[dict], Column] | None = None
    # python-record form (reference contract: record -> record | None)
    record_fn: RecordFn | None = None

    @property
    def is_expression(self) -> bool:
        return self.expr_transform is not None or self.expr_fail_when is not None


class ProcessorRegistry:
    def __init__(self, processors: dict[str, Processor] | None = None):
        self._procs: dict[str, Processor] = dict(processors or {})

    def register(self, proc: Processor) -> None:
        self._procs[proc.name] = proc

    def get(self, name: str) -> Processor:
        if name not in self._procs:
            raise KeyError(f"unknown processor {name!r}; registered: {sorted(self._procs)}")
        return self._procs[name]

    def names(self) -> list[str]:
        return sorted(self._procs)

    def discover_directory(self, root: str) -> list[str]:
        """Scan ``root/transformations`` and ``root/filters`` for ``*.py``
        modules exposing ``process(record)`` — the engine's
        pull_processors.js. Returns the registered names."""
        added: list[str] = []
        for sub, is_filter in (("transformations", False), ("filters", True)):
            d = os.path.join(root, sub)
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                if not fname.endswith(".py") or fname.startswith("_"):
                    continue
                name = fname[:-3]
                spec = importlib.util.spec_from_file_location(
                    f"sps_processors_{sub}_{name}", os.path.join(d, fname)
                )
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                fn = getattr(mod, "process", None)
                if not callable(fn):
                    continue
                self.register(Processor(name=name, is_filter=is_filter, record_fn=fn))
                added.append(name)
        return added

    # -- chain compilation -------------------------------------------------

    def expression_chain(
        self, names: list[str], dlq_topics: list[str | None] | None = None
    ) -> list[Step]:
        """Compile named expression processors into DLQ-routing steps."""
        dlq_topics = dlq_topics or [None] * len(names)
        steps = []
        for name, dlq in zip(names, dlq_topics):
            p = self.get(name)
            if not p.is_expression:
                raise ValueError(
                    f"processor {name!r} is python-record form; use python_chain()"
                )
            steps.append(
                Step(
                    name=p.name,
                    transform=p.expr_transform or (lambda c: {}),
                    fail_when=p.expr_fail_when,
                    is_filter=p.is_filter,
                    dlq=dlq,
                )
            )
        return steps

    def apply_expression_chain(
        self, df: DataFrame, names: list[str], dlq_topics: list[str | None] | None = None
    ) -> DataFrame:
        return apply_chain(df, self.expression_chain(names, dlq_topics))

    def apply_python_chain(
        self,
        df: DataFrame,
        names: list[str],
        dlq_topics: list[str | None] | None = None,
        out_prefix: str = "out_",
    ) -> DataFrame:
        """Run a python-record chain in one Arrow-batched pass.

        Reference semantics reproduced exactly (consumer.js:86-151):
        - step raises + step has DLQ → route ``dlq_<step>``, ORIGINAL record
          kept (out_* nulled);
        - step raises, no DLQ → route ``error_<step>`` (counted, dropped
          downstream);
        - a step returning None does NOT short-circuit: the null record
          becomes the next step's input (which throws on it, since every
          reference processor dereferences the message) — only a chain
          ENDING in None routes ``dropped`` (consumer.js:88-109,134-137);
        - all steps pass → route ``ok`` with transformed out_* columns.

        Records are delivered to processors with real ``None`` for SQL
        NULLs (never pandas NaN), matching the JS contract.
        """
        procs = [self.get(n) for n in names]
        for p in procs:
            if p.record_fn is None:
                raise ValueError(f"processor {p.name!r} has no record_fn")
        dlq_topics = dlq_topics or [None] * len(names)
        chain = [
            (p.name, p.record_fn, dlq) for p, dlq in zip(procs, dlq_topics)
        ]
        in_cols = df.columns
        out_dtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        out_schema_fields = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
            + ["route string"]
            + [
                f"`{out_prefix}{f.name}` {f.dataType.simpleString()}"
                for f in df.schema.fields
            ]
        )

        def run_chain(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                routes, outs = [], []
                # NaN/NaT → None so processors see the JS null contract
                clean = pdf.astype(object).where(pdf.notna(), None)
                for rec in clean.to_dict("records"):
                    route, cur = ROUTE_OK, dict(rec)
                    for step_name, fn, dlq in chain:
                        if cur is None:
                            # reference: processor derefs the null message
                            # and throws → this step's DLQ/error
                            route = (
                                f"dlq_{step_name}" if dlq else f"error_{step_name}"
                            )
                            break
                        try:
                            cur = fn(cur)
                        except Exception:
                            route = (
                                f"dlq_{step_name}" if dlq else f"error_{step_name}"
                            )
                            break
                    if route == ROUTE_OK and cur is None:
                        route = ROUTE_DROPPED  # chain ended null → dropped
                    if route == ROUTE_OK:
                        # contract guard: wrong-typed out values become a
                        # routed error on the last step, not an Arrow crash
                        coerced = {}
                        for c in in_cols:
                            ok, cv = _coerce_out(cur.get(c), out_dtypes[c])
                            if not ok:
                                last_name, _, last_dlq = chain[-1]
                                route = (
                                    f"dlq_{last_name}" if last_dlq
                                    else f"error_{last_name}"
                                )
                                break
                            coerced[c] = cv
                        else:
                            cur = coerced
                    routes.append(route)
                    outs.append(cur if route == ROUTE_OK else None)
                out = pdf.copy()
                out["route"] = routes
                for c in in_cols:
                    out[f"{out_prefix}{c}"] = [
                        (o.get(c) if o is not None else None) for o in outs
                    ]
                yield out

        return df.mapInPandas(run_chain, schema=out_schema_fields)


# ---------------------------------------------------------------- builtins ----


def _builtin_registry() -> ProcessorRegistry:
    from pyspark.sql import functions as F

    reg = ProcessorRegistry()
    # Reference transformations operate on {key, value, num}; the engine's
    # builtins use the same field names (src/transformations/*.js:1-7) and
    # reproduce observable JS coercion semantics on null FIELDS: `null + 10`
    # is 10 and `null + '_appended'` is 'null_appended' in JS (no throw),
    # while String.prototype methods DO throw on a null receiver
    # (capitalize/reverseString → DLQ). Found by the chain fuzzer in
    # tests/test_property_parity.py. Each builtin also carries a
    # record_fn with identical semantics so chains freely mix builtins with
    # user python processors (routed through apply_python_chain).

    def _py_add10(r: dict) -> dict:
        return {**r, "num": (0 if r["num"] is None else r["num"]) + 10}

    def _py_append(r: dict) -> dict:
        v = "null" if r["value"] is None else r["value"]
        return {**r, "value": v + "_appended"}

    def _py_capitalize(r: dict) -> dict:
        return {**r, "value": r["value"].upper()}  # raises on None (JS parity)

    def _py_reverse(r: dict) -> dict:
        if r["value"] is None:
            raise TypeError("reverse of null value")  # JS .split on null throws
        return {**r, "value": r["value"][::-1]}

    def _py_is_even(r: dict):
        # JS: null % 2 → 0 → kept (null coerces to 0)
        return r if (0 if r["num"] is None else r["num"]) % 2 == 0 else None

    reg.register(
        Processor(
            name="add10",
            expr_transform=lambda c: {"num": F.coalesce(c["num"], F.lit(0)) + F.lit(10)},
            record_fn=_py_add10,
        )
    )
    reg.register(
        Processor(
            name="appendString",
            expr_transform=lambda c: {
                "value": F.concat(F.coalesce(c["value"], F.lit("null")), F.lit("_appended"))
            },
            record_fn=_py_append,
        )
    )
    reg.register(
        Processor(
            name="capitalize",
            # JS String.toUpperCase throws on null receiver → fail_when null
            expr_transform=lambda c: {"value": F.upper(c["value"])},
            expr_fail_when=lambda c: c["value"].isNull(),
            record_fn=_py_capitalize,
        )
    )
    reg.register(
        Processor(
            name="reverseString",
            expr_transform=lambda c: {"value": F.reverse(c["value"])},
            expr_fail_when=lambda c: c["value"].isNull(),
            record_fn=_py_reverse,
        )
    )
    reg.register(
        Processor(
            name="isEven",
            is_filter=True,
            # filter convention: fail_when == drop predicate (keep evens);
            # null num → JS coerces to 0 → even → kept
            expr_fail_when=lambda c: F.coalesce(c["num"], F.lit(0)) % 2 != 0,
            record_fn=_py_is_even,
        )
    )

    # Multimodal decode steps (round 11, VERDICT r10 ask #8): binary
    # payloads route through the REAL codecs inside the chain — a
    # gated format (NotImplementedError) or corrupt bytes (ValueError)
    # is an ordinary step exception, so the record lands on the step's
    # DLQ with the ORIGINAL payload, exactly the consumer.js contract.
    # Record-fn only (binary decode has no expression form).

    def _py_decode_image_stats(r: dict) -> dict:
        from stream_processor_spark.operators.multimodal import (
            decode_image_bytes,
        )

        px = decode_image_bytes(bytes(r["payload"]))
        return {
            **r,
            "n_pixels": int(px.shape[0] * px.shape[1]),
            "px_sum": int(px.sum()),
        }

    def _py_decode_wav_stats(r: dict) -> dict:
        from stream_processor_spark.operators.multimodal import decode_wav

        _rate, _channels, samples = decode_wav(bytes(r["payload"]))
        return {
            **r,
            "n_pixels": int(len(samples)),  # sample count in the count slot
            "px_sum": int(sum(int(s) for s in samples)),
        }

    reg.register(
        Processor(name="decodeImageStats", record_fn=_py_decode_image_stats)
    )
    reg.register(
        Processor(name="decodeWavStats", record_fn=_py_decode_wav_stats)
    )
    return reg


BUILTIN_PROCESSORS = _builtin_registry()
