"""Field paths: ``a.b[0].c`` → Spark Column access.

Parity: miso-workflow-types/src/field.rs (Field = dot-separated
FieldAccess segments, each with optional ``[idx]...`` array indices).
Spark mapping: top-level segment is a column; nested segments are
struct ``getField``; indices are array ``getItem``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEG_RE = re.compile(r"^(?P<name>[^\[\]]+)(?P<idx>(\[\d+\])*)$")


@dataclass(frozen=True)
class FieldPath:
    """Parsed field path. ``segments`` is a tuple of (name, indices)."""

    segments: tuple[tuple[str, tuple[int, ...]], ...]

    @staticmethod
    def parse(text: str) -> "FieldPath":
        if not text:
            raise ValueError("empty field path")
        segs: list[tuple[str, tuple[int, ...]]] = []
        for raw in text.split("."):
            m = _SEG_RE.match(raw)
            if not m:
                raise ValueError(f"invalid field segment: {raw!r}")
            idx = tuple(int(i) for i in re.findall(r"\[(\d+)\]", m.group("idx")))
            segs.append((m.group("name"), idx))
        return FieldPath(tuple(segs))

    @property
    def name(self) -> str:
        """Flat output name (how miso names a projected field)."""
        return str(self)

    def is_simple(self) -> bool:
        return len(self.segments) == 1 and not self.segments[0][1]

    def has_array_access(self) -> bool:
        """Any ``[idx]`` in the path (Field::has_array_access,
        miso-workflow-types/src/field.rs)."""
        return any(idx for _, idx in self.segments)

    def to_column(self, schema=None) -> Column:
        # F.get (not getItem) for array indices: out-of-bounds yields
        # null instead of an ANSI INVALID_ARRAY_INDEX error, matching
        # the reference's missing-field semantics on dynamic logs.
        # With a schema, a path that enters a VARIANT column switches
        # to try_variant_get with the remaining segments as a JSON
        # path — a nested key that is absent (or reached through a
        # non-object) yields SQL NULL, i.e. the dynamic model's
        # "missing" (tests.rs filter_starts_with_on_object).
        (root, root_idx), rest = self.segments[0], self.segments[1:]
        col = F.col(f"`{root}`")
        dtype = self._schema_type_of_root(schema)
        consumed_root_idx = 0
        if dtype is not None and self._is_variant(dtype):
            return self._variant_tail(col, root_idx, rest)
        for i in root_idx:
            col = F.get(col, i)
            consumed_root_idx += 1
            dtype = self._elem_type(dtype)
            if dtype is not None and self._is_variant(dtype):
                return self._variant_tail(col, root_idx[consumed_root_idx:], rest)
        for k, (name, idxs) in enumerate(rest):
            if dtype is not None:
                dtype = self._struct_field_type(dtype, name)
                if dtype is not None and self._is_variant(dtype):
                    return self._variant_tail(
                        col.getField(name), idxs, rest[k + 1:]
                    )
            col = col.getField(name)
            for n, i in enumerate(idxs):
                col = F.get(col, i)
                dtype = self._elem_type(dtype)
                if dtype is not None and self._is_variant(dtype):
                    return self._variant_tail(col, idxs[n + 1:], rest[k + 1:])
        return col

    @staticmethod
    def _is_variant(dtype) -> bool:
        try:
            from pyspark.sql.types import VariantType
        except ImportError:  # pragma: no cover - older Spark
            return False
        return isinstance(dtype, VariantType)

    def _schema_type_of_root(self, schema):
        from pyspark.sql.types import StructType

        if not isinstance(schema, StructType):
            return None
        root = self.segments[0][0]
        return next(
            (f.dataType for f in schema.fields if f.name.lower() == root.lower()),
            None,
        )

    @staticmethod
    def _elem_type(dtype):
        from pyspark.sql.types import ArrayType

        return dtype.elementType if isinstance(dtype, ArrayType) else None

    @staticmethod
    def _struct_field_type(dtype, name):
        from pyspark.sql.types import StructType

        if not isinstance(dtype, StructType):
            return None
        return next(
            (f.dataType for f in dtype.fields if f.name.lower() == name.lower()),
            None,
        )

    @staticmethod
    def _variant_tail(col: Column, idxs, rest) -> Column:
        """Remaining path below a VARIANT value as one try_variant_get
        JSON path (``$`` when the variant is the leaf)."""
        path = "$" + "".join(f"[{i}]" for i in idxs)
        for name, nidxs in rest:
            path += f".{name}" + "".join(f"[{i}]" for i in nidxs)
        if path == "$":
            return col
        return F.try_variant_get(col, path, "variant")

    def is_missing_in(self, schema) -> bool:
        """True when this path provably resolves to NO column/field in
        ``schema`` — the reference's dynamic-log model evaluates such
        references as null (tests.rs project_nonexistent_field_arithmetic
        yields rows without the key; filters on them drop rows), where
        Spark would raise UNRESOLVED_COLUMN. Walks struct levels only —
        a map/variant segment defers to Spark's own resolution — and
        matches names case-insensitively, like Spark's default
        resolution (spark.sql.caseSensitive=false)."""
        from pyspark.sql.types import ArrayType, MapType, StructType

        try:  # Spark 4 semi-structured column type
            from pyspark.sql.types import VariantType

            dynamic = (MapType, ArrayType, VariantType)
        except ImportError:  # pragma: no cover - older Spark
            dynamic = (MapType, ArrayType)

        dtype = schema
        for name, idxs in self.segments:
            if isinstance(dtype, dynamic):
                return False  # map/variant/array access — Spark resolves it
            if not isinstance(dtype, StructType):
                # primitive mid-path: `a.b` where a is a string/number
                # can never resolve — the reference's dynamic model
                # yields missing (tests.rs filter_exists_on_object /
                # filter_starts_with_on_object treat it as absent)
                return True
            match = next(
                (f for f in dtype.fields if f.name.lower() == name.lower()),
                None,
            )
            if match is None:
                return True
            dtype = match.dataType
            for _ in idxs:
                if isinstance(dtype, ArrayType):
                    dtype = dtype.elementType
                elif isinstance(dtype, dynamic):
                    return False  # map/variant indexing — defer
                else:
                    return True  # [i] over a primitive — provably absent
        return False

    def resolve_type(self, schema) -> object | None:
        """Walk a StructType to this path's data type (None if absent).
        A path that enters a VARIANT column resolves to VariantType —
        everything below is per-row dynamic."""
        from pyspark.sql.types import ArrayType, StructType

        dtype = schema
        for name, idxs in self.segments:
            if self._is_variant(dtype):
                return dtype
            if not isinstance(dtype, StructType) or name not in dtype.fieldNames():
                return None
            dtype = dtype[name].dataType
            for _ in idxs:
                if self._is_variant(dtype):
                    return dtype
                if not isinstance(dtype, ArrayType):
                    return None
                dtype = dtype.elementType
        return dtype

    def __str__(self) -> str:
        parts = []
        for name, idxs in self.segments:
            parts.append(name + "".join(f"[{i}]" for i in idxs))
        return ".".join(parts)
