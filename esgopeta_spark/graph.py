"""GunGraph — the reference's user-facing surface on Spark.

Reference entry points (gun/doc.go:5-7): ``Scoped(...).FetchOne`` (point
read), ``Scoped(...).Fetch`` (live subscription — see
esgopeta_spark.streaming), ``Scoped(...).Put`` (write with lazy parent
creation).  A path ``root -> f1 -> f2`` is a lazy chain of segments
(gun/scoped.go:26-34); top-level fields are their own souls
(gun/scoped_fetch.go:58-62).

Design split:

- **point ops** (``fetch_one``, ``soul_of``, ``put``): genuinely
  single-key operations.  They resolve path prefixes with memoized
  point lookups (the reference's soul cache, gun/scoped.go:44-81) —
  collecting ONE row per hop is the correct plan for a point read, the
  same way the reference does one map probe per hop.
- **bulk ops** (``traverse``, ``nodes``, ``edges``): fully distributed,
  expressed as iterated equi-joins on the quads relation — the
  GraphX-style analytics subset.  No collect anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esgopeta_spark.ham import empty_quads, ham_merge
from esgopeta_spark.soul import SoulGen
from esgopeta_spark.types import (
    QUAD_SCHEMA,
    UPDATE_SCHEMA,
    VALUE_COLUMNS,
    VALUE_RELATION,
    decode_value,
    encode_value,
)


class ErrNotObject(Exception):
    """A path segment holds a non-relation value (gun/scoped.go:36-38)."""


class ErrLookupOnTopLevel(Exception):
    """Point lookup on a bare top-level field (gun/scoped_fetch.go:76-79)."""


@dataclass
class FetchResult:
    """Mirrors gun/scoped_fetch.go:9-41: ``value_exists`` distinguishes a
    stored null from an absent key (D1 null-vs-absent)."""

    value: Any = None
    value_exists: bool = False
    field: str = ""
    state: float | None = None


@dataclass
class PutResult:
    graph: "GunGraph"
    updates: list[dict] = dc_field(default_factory=list)  # the would-be wire message rows


class GunGraph:
    def __init__(self, spark: SparkSession, quads: DataFrame | None = None, soul_gen: SoulGen | None = None):
        self.spark = spark
        self._base = quads if quads is not None else empty_quads(spark)
        # update frames not yet folded into _base.  HAM merge is a
        # semilattice join (associative, commutative, idempotent —
        # ham.py module docstring), so folding N puts in ONE aggregate at
        # read time is value-identical to merging after every put; it
        # turns a put chain's plan from N nested aggregates into one.
        self._pending: list[DataFrame] = []
        self.soul_gen = soul_gen or SoulGen()
        self._soul_cache: dict[tuple[str, ...], str] = {}
        self._put_count = 0
        # Driver-side shadow of the put log, kept ONLY while the graph is
        # built purely by puts on an empty base (quads=None construction).
        # Point reads (_lookup) then resolve as a python HAM fold over
        # these rows — zero Spark jobs for the write-then-read scripts the
        # reference's client API is made of.  None = not tracking (the
        # base held unknown data); put scripts are small by nature, so the
        # linear scan is bounded — bulk writes go through streaming/upsert.
        self._pure_put_rows: list[dict] | None = [] if quads is None else None
        self._pure_put_fold: DataFrame | None = None  # cached quads of the put log

    @property
    def quads(self) -> DataFrame:
        """Merged snapshot (winner per key).  A pure-put graph builds it
        straight from the driver-side put log — ONE createDataFrame + one
        HAM aggregate, however long the put chain, so the plan never
        compounds and no lineage-bounding checkpoint (which executes
        eagerly under AQE) is needed.  Otherwise folds any pending put
        frames on first read and caches the folded frame."""
        if self._pure_put_rows:
            if self._pure_put_fold is None:  # cache per (immutable) graph
                self._pure_put_fold = ham_merge(
                    self.spark.createDataFrame(self._pure_put_rows, QUAD_SCHEMA)
                )
            return self._pure_put_fold
        if self._pending:
            u = self._base
            for p in self._pending:
                u = u.unionByName(p)
            self._base = ham_merge(u)
            self._pending = []
        return self._base

    @quads.setter
    def quads(self, df: DataFrame) -> None:
        self._base = df
        self._pending = []
        self._pure_put_rows = None  # external frame: unknown content
        self._pure_put_fold = None

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_updates(cls, spark: SparkSession, updates: DataFrame, **kw) -> "GunGraph":
        """Replay an update log (UPDATE_SCHEMA) into a snapshot graph."""
        return cls(spark, ham_merge(updates), **kw)

    @classmethod
    def from_rows(cls, spark: SparkSession, rows: Iterable[dict], **kw) -> "GunGraph":
        df = spark.createDataFrame(list(rows), QUAD_SCHEMA)
        return cls(spark, ham_merge(df), **kw)

    # ------------------------------------------------------------------
    # point reads (reference A1-A5)
    # ------------------------------------------------------------------

    def _lookup(self, soul: str, field: str):
        if self._pure_put_rows is not None:
            # python HAM fold over the put log: same total order as
            # ham_merge — (state, value_json) max (ham.py docstring);
            # value_json_py ≡ value_json_col is pinned by tests
            from esgopeta_spark.types import value_json_py

            best = None
            for r in self._pure_put_rows:
                if r["soul"] == soul and r["field"] == field:
                    k = (r["state"], value_json_py(r))
                    if best is None or k > best[0]:
                        best = (k, r)
            return best[1] if best else None
        rows = (
            self.quads.filter((F.col("soul") == soul) & (F.col("field") == field))
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    def soul_of(self, *path: str) -> str | None:
        """Resolve a path prefix to a node soul, memoized (gun/scoped.go:44-81).

        Top-level roots are their own souls (gun/scoped_fetch.go:58-62).
        Raises ErrNotObject if an intermediate value is not a relation.
        Returns None if an intermediate key is absent.
        """
        if not path:
            raise ValueError("empty path")
        key = tuple(path)
        if key in self._soul_cache:
            return self._soul_cache[key]
        if len(path) == 1:
            self._soul_cache[key] = path[0]
            return path[0]
        parent = self.soul_of(*path[:-1])
        if parent is None:
            return None
        row = self._lookup(parent, path[-1])
        if row is None:
            return None
        if row["value_type"] != VALUE_RELATION:
            raise ErrNotObject(f"path {'/'.join(path)} hits non-relation value")
        soul = row["value_relation"]
        self._soul_cache[key] = soul
        return soul

    def fetch_one(self, *path: str) -> FetchResult:
        """Point read (gun/scoped_fetch.go:43-74).

        A bare top-level fetch returns a self-relation without any lookup,
        exactly like the reference.
        """
        if not path:
            raise ValueError("empty path")
        field = path[-1]
        if len(path) == 1:
            return FetchResult(value={"#": field}, value_exists=True, field=field)
        parent = self.soul_of(*path[:-1])
        if parent is None:
            return FetchResult(field=field)
        row = self._lookup(parent, field)
        if row is None:
            return FetchResult(field=field)
        return FetchResult(
            value=decode_value(row), value_exists=True, field=field, state=row["state"]
        )

    # ------------------------------------------------------------------
    # writes (reference B1-B5)
    # ------------------------------------------------------------------

    def put(
        self,
        path: Sequence[str],
        value: Any,
        state: float | None = None,
        fail_without_parent: bool = False,
        msg_id: str | None = None,
    ) -> PutResult:
        """Write with lazy parent creation (gun/scoped_put.go:50-145).

        - a top-level put is an error (gun/scoped_put.go:79-82)
        - every missing path prefix gets a fresh soul and a relation quad;
          all quads of one put share ONE state (gun/scoped_put.go:102)
        - ``fail_without_parent`` mirrors PutOptionFailWithoutParent
        - returns the new (immutable) graph plus the update rows that
          would form the outgoing wire message
        """
        path = list(path)
        if len(path) < 2:
            raise ValueError("cannot put on top level (gun/scoped_put.go:79-82)")
        if state is None:
            import time as _t

            state = float(int(_t.time() * 1000))
        new_quads: list[dict] = []
        parent = path[0]  # top-level root: soul == field name
        self._soul_cache[(path[0],)] = parent
        for i in range(1, len(path) - 1):
            prefix = tuple(path[: i + 1])
            soul = None
            try:
                soul = self.soul_of(*prefix)
            except ErrNotObject:
                raise
            if soul is None:
                if fail_without_parent:
                    raise ErrNotObject(f"parent {'/'.join(prefix)} missing")
                soul = self.soul_gen()
                new_quads.append(
                    {"soul": parent, "field": path[i], **encode_value({"#": soul}), "state": state}
                )
                self._soul_cache[prefix] = soul
            parent = soul
        new_quads.append({"soul": parent, "field": path[-1], **encode_value(value), "state": state})

        g = GunGraph(self.spark, self._base, soul_gen=self.soul_gen)
        g._soul_cache = dict(self._soul_cache)
        g._put_count = self._put_count + 1
        if self._pure_put_rows is not None:
            # pure-put graph: the driver-side log IS the state — no
            # pending frames, no folds; quads derives in one aggregate
            g._pure_put_rows = self._pure_put_rows + new_quads
        else:
            g._pure_put_rows = None
            updates_df = self.spark.createDataFrame(new_quads, QUAD_SCHEMA)
            g._pending = self._pending + [updates_df]
            # long put chains still need bounded lineage: fold + checkpoint
            # every 16 pending frames (executes under AQE; pure-put graphs
            # above never pay this)
            if len(g._pending) >= 16:
                g.quads = g.quads.localCheckpoint(eager=False)
        return PutResult(graph=g, updates=new_quads)

    # ------------------------------------------------------------------
    # bulk / analytics (distributed; the GraphX-style subset)
    # ------------------------------------------------------------------

    def edges(self) -> DataFrame:
        """GraphX-style edge list: (src, attr, dst) = relation quads."""
        return self.quads.filter(F.col("value_type") == VALUE_RELATION).select(
            F.col("soul").alias("src"),
            F.col("field").alias("attr"),
            F.col("value_relation").alias("dst"),
        )

    def traverse(self, roots: DataFrame, *fields: str) -> DataFrame:
        """Bulk multi-hop traversal: for every row in ``roots`` (column
        ``soul``), follow ``fields`` hop by hop via equi-joins on the edge
        slice.  Returns roots' columns plus ``soul`` rebound to the target.

        Each hop is one equi-join on the relation slice; Catalyst picks
        broadcast when the edge slice is small, sort-merge otherwise.  At
        100 TB, quads bucketed by soul make these co-located joins.
        """
        cur = roots
        edges = self.edges()
        for f_name in fields:
            hop = edges.filter(F.col("attr") == f_name).select(
                F.col("src"), F.col("dst").alias("_next")
            )
            cur = (
                cur.join(hop, cur["soul"] == hop["src"], "inner")
                .drop("soul", "src")
                .withColumnRenamed("_next", "soul")
            )
        return cur

    def values_at(self, roots: DataFrame, field_name: str) -> DataFrame:
        """Terminal hop: read the (scalar) value of ``field_name`` for every
        root soul.  Returns roots' columns + the tagged value columns."""
        vals = self.quads.filter(F.col("field") == field_name).select(
            F.col("soul").alias("_vsoul"), *VALUE_COLUMNS, F.col("state")
        )
        return roots.join(vals, roots["soul"] == vals["_vsoul"], "left").drop("_vsoul")

    def node(self, soul: str) -> dict[str, Any]:
        """Record view of one node (driver-side; point read)."""
        rows = self.quads.filter(F.col("soul") == soul).collect()
        return {r["field"]: decode_value(r) for r in rows}

    def compact(self) -> "GunGraph":
        g = GunGraph(self.spark, self.quads.localCheckpoint(eager=True), soul_gen=self.soul_gen)
        g._soul_cache = dict(self._soul_cache)
        return g

    # ------------------------------------------------------------------
    # scoped chain API (reference A1: gun/scoped.go) + live subscribe (A6)
    # ------------------------------------------------------------------

    def scoped(self, *path: str) -> "Scoped":
        """Lazy path chain, no I/O at build time — `g.scoped("a","b","c")`
        mirrors `gun.Scoped(ctx, "a", "b", "c")` (gun/gun.go:147-156)."""
        return Scoped(self, list(path))

    def subscribe(self, updates_stream: DataFrame, *path: str) -> DataFrame:
        """Live Fetch (gun/scoped_fetch.go:89-110): a streaming DataFrame of
        winning updates for one (soul, field), driven by the update stream.

        Resolves the path prefix against the current snapshot (the
        reference resolves souls before subscribing too), then filters the
        stream to the key and applies the stateful HAM merge so only
        IsImmediateUpdate transitions are emitted.  The caller owns the
        writeStream (sink, trigger, lifecycle) — stopping the query is
        FetchDone (A9).
        """
        from esgopeta_spark.streaming.ham_stream import streaming_ham_merge

        if len(path) < 2:
            raise ErrLookupOnTopLevel("subscribe needs a parent path + field")
        parent = self.soul_of(*path[:-1])
        if parent is None:
            raise ErrNotObject(f"cannot resolve parent of {'/'.join(path)}")
        key_filtered = updates_stream.filter(
            (F.col("soul") == parent) & (F.col("field") == path[-1])
        )
        return streaming_ham_merge(key_filtered)


class Scoped:
    """Parent-linked lazy path expression (gun/scoped.go:26-42).

    Pure convenience over GunGraph's path methods, giving the reference's
    fluent surface: ``g.scoped("room").scoped("msg").fetch_one()``.
    ``put`` returns the updated Scoped (bound to the new graph) — access
    ``.graph`` for the underlying GunGraph and ``.last_put`` for the
    would-be wire message rows.
    """

    def __init__(self, graph: GunGraph, path: list[str]):
        if not path:
            raise ValueError("scoped path must be non-empty")
        self.graph = graph
        self.path = path
        self.last_put: list[dict] = []

    def scoped(self, *children: str) -> "Scoped":
        return Scoped(self.graph, self.path + list(children))

    def soul(self) -> str | None:
        return self.graph.soul_of(*self.path)

    def fetch_one(self) -> FetchResult:
        return self.graph.fetch_one(*self.path)

    def put(self, value: Any, **kw) -> "Scoped":
        res = self.graph.put(self.path, value, **kw)
        out = Scoped(res.graph, self.path)
        out.last_put = res.updates
        return out

    def subscribe(self, updates_stream: DataFrame) -> DataFrame:
        return self.graph.subscribe(updates_stream, *self.path)
