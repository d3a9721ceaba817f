"""The reference's on-disk B+tree format as a Spark data source — the
literal migration path for a findb user (`spark.read.format("findb")`).

Format (reimplemented from the reference's documented layout, not its code):

- file header, offset 0, 12 bytes big-endian: ``page_size``, ``page_count``,
  ``root_page_num`` (reference ``file.rs:52-57``, ``file.rs:77-90``)
- pages of ``page_size`` bytes follow at offset ``12 + i * page_size``
- page header, 16 bytes: ``page_type`` (0=leaf, 1=inner), ``num_keys``,
  ``extra_page_num``, one spare u32 (``file.rs:92-95``, ``file.rs:101-118``)
- 16-byte slots: key = (asset_id u32, date u32, timestamp u32) then a leaf
  f32 value or an inner child page number (``file.rs:124-147``); all
  big-endian (``file.rs:573-589``)
- leaves are back-chained oldest<-newest through ``extra_page_num``
  (u32::MAX sentinel, ``file.rs:346-347``); an inner holds k separator
  keys + k+1 children — child i in slot i's value area, the (capacity+1)-th
  child overflowing into ``extra_page_num`` (``file.rs:381-423``)
- descent is lower-bound binary search, equal key -> right child
  (``file.rs:149-170``, ``file.rs:434-443``)

Reader: a Spark 4 Python DataSource. Rows live only in leaves, so tasks
scan disjoint page ranges in parallel and skip inner pages — no descent
needed for a full scan; partition count tracks file size. Filter pushdown
(Spark 4.1 ``pushFilters``) records asset_id/date/ts bounds and skips
whole leaves whose [first,last] key range can't match — the page-skipping
analog of the reference's seek — while returning every filter for Spark to
re-apply (safe partial pushdown).

Writer: single-pass bottom-up bulk build from key-sorted rows (the O4
analog, ``file.rs:296-379``): leaves first (back-chained), then inner
levels, root last, header rewritten. Page numbering is sequential rather
than the reference's interleaved flush order — a valid tree under the
descent algorithm either way, since all pointers are explicit. Single
file == single writer: this is an export/interop utility (stream via
``toLocalIterator``), not the 100 TB path — that's the Parquet layout
(layout.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_FILE_HEADER = ">III"  # page_size, page_count, root_page_num
_PAGE_HEADER = ">IIII"  # page_type, num_keys, extra_page_num, spare
_LEAF_SLOT = ">IIIf"  # asset_id, date, ts, value
_INNER_SLOT = ">IIII"  # asset_id, date, ts, child page

FILE_HEADER_SIZE = struct.calcsize(_FILE_HEADER)
PAGE_HEADER_SIZE = struct.calcsize(_PAGE_HEADER)
SLOT_SIZE = struct.calcsize(_LEAF_SLOT)
LEAF_TYPE, INNER_TYPE = 0, 1
U32_MAX = 0xFFFFFFFF

Key = tuple[int, int, int]


def page_size_for_keys(num_keys: int) -> int:
    """Smallest page size holding ``num_keys`` slots (test-tree helper)."""
    return PAGE_HEADER_SIZE + num_keys * SLOT_SIZE


# --------------------------------------------------------------------------
# writer (bulk load)
# --------------------------------------------------------------------------


def write_btree_file(
    path: str, rows: Iterable[tuple[int, int, int, float]], page_size: int = 4096
) -> int:
    """Bulk-load key-sorted ``(asset_id, date, ts, value)`` rows into a
    findb-format B+tree file. Returns the page count. Input must be sorted
    ascending by the full key (the reference's load-time contract)."""
    cap = (page_size - PAGE_HEADER_SIZE) // SLOT_SIZE
    if cap < 1:
        raise ValueError(f"page_size {page_size} holds no slots")

    with open(path, "wb") as f:
        f.write(struct.pack(_FILE_HEADER, page_size, 0, 0))

        def emit(page_type: int, extra: int, slots: list[tuple], leaf: bool) -> None:
            buf = bytearray(page_size)
            struct.pack_into(_PAGE_HEADER, buf, 0, page_type, len(slots), extra, 0)
            fmt = _LEAF_SLOT if leaf else _INNER_SLOT
            for i, s in enumerate(slots):
                struct.pack_into(fmt, buf, PAGE_HEADER_SIZE + i * SLOT_SIZE, *s)
            f.write(buf)

        # --- leaves: sequential fill, back-chained ---
        page_count = 0
        children: list[tuple[Key, int]] = []  # (first key, page number)
        pending: list[tuple] = []
        prev_key: Key | None = None
        prev_leaf = U32_MAX

        def flush_leaf() -> None:
            nonlocal page_count, prev_leaf
            children.append(((pending[0][0], pending[0][1], pending[0][2]), page_count))
            emit(LEAF_TYPE, prev_leaf, pending, leaf=True)
            prev_leaf = page_count
            page_count += 1
            pending.clear()

        for row in rows:
            key = (row[0], row[1], row[2])
            if prev_key is not None and key < prev_key:
                raise ValueError(f"input not key-sorted: {key} after {prev_key}")
            prev_key = key
            pending.append(tuple(row))
            if len(pending) == cap:
                flush_leaf()
        if pending:
            flush_leaf()
        if not children:
            raise ValueError("empty input")

        # --- inner levels, bottom-up; root written last ---
        while len(children) > 1:
            # group children cap+1 per node; never leave a 1-child tail
            groups: list[list[tuple[Key, int]]] = [
                children[i : i + cap + 1] for i in range(0, len(children), cap + 1)
            ]
            if len(groups) > 1 and len(groups[-1]) == 1:
                groups[-1].insert(0, groups[-2].pop())
            nxt: list[tuple[Key, int]] = []
            for g in groups:
                # slot i: key area = separator i (first key of child i+1),
                # value area = child i; the (cap+1)-th child overflows into
                # extra_page_num (mirrors add_to_parent's slot protocol)
                buf = bytearray(page_size)
                extra = 0
                for i, (k, pn) in enumerate(g):
                    if i <= cap - 1:
                        struct.pack_into(
                            ">I", buf, PAGE_HEADER_SIZE + i * SLOT_SIZE + 12, pn
                        )
                    else:
                        extra = pn
                    if i + 1 < len(g):
                        struct.pack_into(
                            ">III", buf, PAGE_HEADER_SIZE + i * SLOT_SIZE, *g[i + 1][0]
                        )
                struct.pack_into(_PAGE_HEADER, buf, 0, INNER_TYPE, len(g) - 1, extra, 0)
                f.write(buf)
                nxt.append((g[0][0], page_count))
                page_count += 1
            children = nxt

        root = children[0][1]
        f.seek(0)
        f.write(struct.pack(_FILE_HEADER, page_size, page_count, root))
    return page_count


# --------------------------------------------------------------------------
# low-level reading
# --------------------------------------------------------------------------


def _read_header(f) -> tuple[int, int, int]:
    return struct.unpack(_FILE_HEADER, f.read(FILE_HEADER_SIZE))


def _load_page(f, page_size: int, page_num: int) -> bytes:
    f.seek(FILE_HEADER_SIZE + page_num * page_size)
    return f.read(page_size)


def _page_header(buf: bytes) -> tuple[int, int, int]:
    t, n, extra, _ = struct.unpack_from(_PAGE_HEADER, buf, 0)
    return t, n, extra


def _leaf_rows(buf: bytes, num_keys: int) -> Iterator[tuple[int, int, int, float]]:
    for i in range(num_keys):
        yield struct.unpack_from(_LEAF_SLOT, buf, PAGE_HEADER_SIZE + i * SLOT_SIZE)


def descend(path: str, key: Key) -> int:
    """Root-to-leaf descent for ``key`` (the reference's seek,
    ``file.rs:425-452``): lower-bound binary search per inner page, equal
    -> right child. Returns the leaf page number. Exists to validate that
    written files are descent-correct for a reference-compatible reader."""
    with open(path, "rb") as f:
        page_size, _, root = _read_header(f)
        cap = (page_size - PAGE_HEADER_SIZE) // SLOT_SIZE
        page_num = root
        buf = _load_page(f, page_size, page_num)
        ptype, num_keys, extra = _page_header(buf)
        while ptype == INNER_TYPE:
            lo, hi = 0, num_keys
            while lo < hi:
                mid = (lo + hi) // 2
                mk = struct.unpack_from(_INNER_SLOT, buf, PAGE_HEADER_SIZE + mid * SLOT_SIZE)[:3]
                if key > mk:
                    lo = mid + 1
                elif key < mk:
                    hi = mid
                else:
                    lo = mid + 1
                    break
            if lo < cap:
                page_num = struct.unpack_from(_INNER_SLOT, 
                    buf, PAGE_HEADER_SIZE + lo * SLOT_SIZE
                )[3]
            else:
                page_num = extra
            buf = _load_page(f, page_size, page_num)
            ptype, num_keys, extra = _page_header(buf)
        return page_num


# --------------------------------------------------------------------------
# Spark data source
# --------------------------------------------------------------------------

#: target bytes per input partition (many pages per task)
_PARTITION_BYTES = 64 * 1024 * 1024

_KEY_COLS = ("asset_id", "date", "ts")


@dataclass
class _PageRange(InputPartition):
    start: int
    end: int  # exclusive


class FindbReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("findb source requires a path")
        # col -> [lo, hi] inclusive bounds from pushed filters
        self.bounds: dict[str, list[int]] = {}

    def pushFilters(self, filters):  # noqa: N802 - API name
        for flt in filters:
            col = flt.attribute[-1] if flt.attribute else None
            if col not in _KEY_COLS or not isinstance(
                flt, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                continue
            try:
                v = int(flt.value)
            except (TypeError, ValueError):
                continue
            b = self.bounds.setdefault(col, [0, U32_MAX])
            if isinstance(flt, EqualTo):
                b[0], b[1] = max(b[0], v), min(b[1], v)
            elif isinstance(flt, GreaterThan):
                b[0] = max(b[0], v + 1)
            elif isinstance(flt, GreaterThanOrEqual):
                b[0] = max(b[0], v)
            elif isinstance(flt, LessThan):
                b[1] = min(b[1], v - 1)
            else:
                b[1] = min(b[1], v)
        # partial pushdown: bounds only *skip leaves*; Spark re-applies all
        return filters

    def partitions(self):
        with open(self.path, "rb") as f:
            page_size, page_count, _ = _read_header(f)
        per_part = max(1, _PARTITION_BYTES // page_size)
        return [
            _PageRange(start, min(start + per_part, page_count))
            for start in range(0, page_count, per_part)
        ]

    def _leaf_may_match(self, first: Key, last: Key) -> bool:
        """Key-range vs bounds intersection. asset_id bounds compare against
        the leaf's [first,last] asset span; date/ts bounds only bind when
        the leaf covers a single asset (resp. single date) — conservative,
        never false-negative."""
        b = self.bounds.get("asset_id")
        if b and (first[0] > b[1] or last[0] < b[0]):
            return False
        if first[0] == last[0]:
            b = self.bounds.get("date")
            if b and (first[1] > b[1] or last[1] < b[0]):
                return False
            if first[1] == last[1]:
                b = self.bounds.get("ts")
                if b and (first[2] > b[1] or last[2] < b[0]):
                    return False
        return True

    def read(self, partition: _PageRange):
        with open(self.path, "rb") as f:
            page_size, _, _ = _read_header(f)
            f.seek(FILE_HEADER_SIZE + partition.start * page_size)
            blob = f.read((partition.end - partition.start) * page_size)
        for p in range(partition.end - partition.start):
            buf = blob[p * page_size : (p + 1) * page_size]
            ptype, num_keys, _ = _page_header(buf)
            if ptype != LEAF_TYPE or num_keys == 0:
                continue
            if self.bounds:
                first = struct.unpack_from(_LEAF_SLOT, buf, PAGE_HEADER_SIZE)[:3]
                last = struct.unpack_from(_LEAF_SLOT, 
                    buf, PAGE_HEADER_SIZE + (num_keys - 1) * SLOT_SIZE
                )[:3]
                if not self._leaf_may_match(first, last):
                    continue
            yield from _leaf_rows(buf, num_keys)


class FindbDataSource(DataSource):
    """``spark.read.format("findb").load("/path/prices.db")``."""

    @classmethod
    def name(cls) -> str:
        return "findb"

    def schema(self) -> str:
        # storage-true types: u32 keys widen to BIGINT/INT, f32 value stays FLOAT
        return "asset_id BIGINT, date INT, ts BIGINT, value FLOAT"

    def reader(self, schema) -> FindbReader:
        return FindbReader(self.options)


def register(spark) -> None:
    # pushFilters requires the (runtime) python-pushdown flag; sessions from
    # findb_spark.get_spark set it at build time, foreign sessions here
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # ship this module by value: the DataSource class round-trips through
    # cloudpickle into Python workers, which need not have findb_spark on
    # their sys.path (driver-only installs, spark-submit without --py-files)
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(FindbDataSource)


def read_prices_db(spark, path: str):
    """Open a findb .db file as a canonical prices DataFrame (value widened
    to double for the engine's query surface)."""
    from pyspark.sql import functions as F

    register(spark)
    df = spark.read.format("findb").load(path)
    return df.select("asset_id", "date", "ts", F.col("value").cast("double").alias("value"))


def export_prices_db(prices, path: str, page_size: int = 4096) -> int:
    """Export a prices DataFrame to the reference's file format. Streams
    rows through the driver in key order (``toLocalIterator`` — bounded
    memory, single-writer by the format's nature)."""
    it = (
        prices.select("asset_id", "date", "ts", "value")
        .orderBy("asset_id", "date", "ts")
        .toLocalIterator()
    )
    return write_btree_file(
        path, ((r.asset_id, r.date, r.ts, float(r.value)) for r in it), page_size
    )
