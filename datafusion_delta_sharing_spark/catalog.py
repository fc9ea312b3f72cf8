"""Share catalog -> Spark views (A30-A32 in SURVEY.md §2).

Parity target: ``/root/reference/src/catalog/mod.rs`` — an eagerly-listed
catalog hierarchy (``DeltaSharingCatalogList`` lists every share,
``DeltaSharingCatalog`` eagerly groups each share's tables by schema,
:46-175) with *lazy* per-table resolution on first reference (:196-220).

Pure PySpark cannot install a JVM ``CatalogPlugin``, so three-part names
surface two ways (SURVEY.md §7):

* flat temp views named ``share__schema__table`` (``Table.view_name()``);
* ``DeltaSharingCatalog.sql(...)`` which rewrites ``share.schema.table``
  identifiers in the query text to those views, registering each referenced
  table on demand (the lazy-resolution analogue).

``list_tables()`` returns the ``information_schema.tables`` analogue
(``/root/reference/examples/catalog.rs:8-15``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from datafusion_delta_sharing_spark.client import DeltaSharingClient
from datafusion_delta_sharing_spark.profile import Profile
from datafusion_delta_sharing_spark.securable import Share, Table
from datafusion_delta_sharing_spark.sources.reader import DeltaSharingReader


class DeltaSharingCatalog:
    """Session-level catalog over every share visible to a profile."""

    def __init__(self, spark: SparkSession,
                 client_or_profile: DeltaSharingClient | Profile,
                 shares: list[str] | None = None):
        self.spark = spark
        self.client = (client_or_profile
                       if isinstance(client_or_profile, DeltaSharingClient)
                       else DeltaSharingClient(client_or_profile))
        self.reader = DeltaSharingReader(spark, self.client)
        # Eager discovery (catalog/mod.rs:71-73, 136-160), memoized here so
        # the N+1 listing happens once per catalog object, not per query.
        share_objs = ([Share(name=s) for s in shares] if shares is not None
                      else self.client.list_shares())
        self.tables: dict[str, Table] = {}
        for share in share_objs:
            for table in self.client.list_all_tables(share):
                self.tables[table.full_name()] = table
        # Spark SQL identifiers are case-insensitive: `Sales.Retail.Orders`
        # must resolve to the same share as `sales.retail.orders`. Sharing
        # names ARE case-sensitive server-side, so two catalog tables may
        # differ only in case: mark that lowercase key ambiguous (None)
        # instead of letting dict insertion order pick a winner — an
        # exact-spelled reference still resolves, anything else refuses
        # loudly rather than silently reading the other table
        self._tables_ci: dict[str, str | None] = {}
        for fqn in self.tables:
            low = fqn.lower()
            self._tables_ci[low] = None if low in self._tables_ci else fqn
        self._resolved: dict[str, DataFrame] = {}
        # view-name ownership: share='a__b',schema='c' and share='a',
        # schema='b__c' flatten to the SAME view name — clobbering would
        # silently read the wrong table, so collisions refuse loudly
        self._view_owner: dict[str, str] = {}

    # -- discovery surface (A30-A31) --------------------------------------

    def share_names(self) -> list[str]:
        return sorted({t.share for t in self.tables.values()})

    def schema_names(self, share: str) -> list[str]:
        return sorted({t.schema for t in self.tables.values() if t.share == share})

    def table_names(self, share: str | None = None,
                    schema: str | None = None) -> list[str]:
        return sorted(
            fqn for fqn, t in self.tables.items()
            if (share is None or t.share == share)
            and (schema is None or t.schema == schema)
        )

    def list_tables(self) -> DataFrame:
        """``information_schema.tables`` analogue as a DataFrame."""
        rows = [
            (t.share, t.schema, t.name, t.view_name())
            for _, t in sorted(self.tables.items())
        ]
        return self.spark.createDataFrame(
            rows, "share string, schema string, table_name string, view_name string"
        )

    # -- lazy resolution (A32) ---------------------------------------------

    def table(self, fqn: str) -> DataFrame:
        """Resolve ``share.schema.table`` to a DataFrame, memoized — the
        analogue of ``SchemaProvider::table`` building a provider on first
        reference (catalog/mod.rs:196-220). Lookup is case-insensitive,
        like Spark SQL identifiers."""
        if fqn not in self.tables:
            low = fqn.lower()
            canonical = self._tables_ci.get(low)
            if canonical is None:
                if low in self._tables_ci:
                    raise KeyError(
                        f"table name {fqn!r} is ambiguous: multiple "
                        "catalog tables differ only in case "
                        f"({sorted(t for t in self.tables if t.lower() == low)}); "
                        "spell the name exactly")
                raise KeyError(f"table {fqn!r} not found in catalog; "
                               f"known: {sorted(self.tables)[:10]}")
            fqn = canonical
        if fqn not in self._resolved:
            view = self.tables[fqn].view_name()
            if not re.fullmatch(r"[A-Za-z_][\w]*", view):
                raise KeyError(
                    f"table {fqn!r} flattens to {view!r}, which is not a "
                    "valid Spark view identifier — access it via "
                    "catalog.table(...) without SQL, or rename the share")
            # ownership is CASE-INSENSITIVE: Spark temp-view names are —
            # 's__d__t' and 'S__d__t' would silently clobber each other
            # in createOrReplaceTempView even though the strings differ
            owner = self._view_owner.setdefault(view.lower(), fqn)
            if owner != fqn:
                raise KeyError(
                    f"view name collision: {fqn!r} and {owner!r} both "
                    f"flatten to {view!r} (Spark view names are "
                    "case-insensitive); register one of them manually "
                    "under a different view name")
            df = self.reader.table(self.tables[fqn])
            df.createOrReplaceTempView(view)
            self._resolved[fqn] = df
        return self._resolved[fqn]

    def register_all(self) -> list[str]:
        """Materialize a temp view per table (eager variant). Returns view
        names. Read-only by construction — there is no write path, matching
        ``register_catalog -> unimplemented!`` (catalog/mod.rs:46-108)."""
        for fqn in sorted(self.tables):
            self.table(fqn)  # registers the view; raises on failure
        return [self.tables[fqn].view_name() for fqn in sorted(self.tables)]

    # -- three-part-name SQL (EP2) -----------------------------------------

    _FQN_RE = re.compile(
        r"(?<![\w.`])([A-Za-z_][\w]*)\.([A-Za-z_][\w]*)\.([A-Za-z_][\w]*)(?![\w.`(])"
    )

    _INFO_SCHEMA_RE = re.compile(
        r"(?<![\w.`])information_schema\.tables(?![\w.`(])", re.IGNORECASE)

    # regions the rewriter must never touch: string literals (with '' / \'
    # escaping), backtick identifiers, and SQL comments.
    # Dialect assumption (ADVICE r2): double-quoted text is classified as a
    # STRING LITERAL — Spark's default. Under ANSI mode with
    # spark.sql.ansi.doubleQuotedIdentifiers=true, "share"."schema"."table"
    # would be a quoted table reference and skipped by the rewriter; quote
    # shared-table names with backticks (or leave them bare) in that mode.
    _OPAQUE_RE = re.compile(
        r"'(?:[^'\\]|\\.|'')*'"
        r'|"(?:[^"\\]|\\.|"")*"'
        r"|`(?:[^`]|``)*`"
        r"|--[^\n]*",
        re.DOTALL)
    _OPAQUE_OPEN_RE = re.compile(r"['\"`]|--|/\*")

    def _opaque_spans(self, query: str) -> list[tuple[int, int]]:
        """(start, end) spans the rewriter must never touch. Bracketed
        comments are depth-counted by hand: Spark nests ``/* /* */ */``,
        and the old non-greedy ``/\\*.*?\\*/`` regex stopped at the FIRST
        ``*/`` — the tail of a nested comment was treated as code and a
        three-part name inside commented-out text triggered a network
        fetch + temp-view registration as a side effect (r5 review). An
        unterminated ``/*`` is opaque to end-of-string (fail safe)."""
        spans: list[tuple[int, int]] = []
        i, n = 0, len(query)
        while i < n:
            m = self._OPAQUE_OPEN_RE.search(query, i)
            if m is None:
                break
            j = m.start()
            if query.startswith("/*", j):
                depth, k = 1, j + 2
                while k < n and depth:
                    if query.startswith("/*", k):
                        depth, k = depth + 1, k + 2
                    elif query.startswith("*/", k):
                        depth, k = depth - 1, k + 2
                    else:
                        k += 1
                spans.append((j, k))
                i = k
            else:
                mm = self._OPAQUE_RE.match(query, j)
                if mm is not None:
                    spans.append((j, mm.end()))
                    i = mm.end()
                else:
                    i = j + 1  # unterminated quote: leave to Spark's parser
        return spans

    def _rewrite_code_regions(self, query: str, rewrite) -> str:
        """Apply ``rewrite(text) -> text`` only to the parts of ``query``
        outside string literals, backtick quotes, and comments — a data
        string that happens to spell ``share.schema.table`` must survive
        verbatim."""
        out, pos = [], 0
        for start, end in self._opaque_spans(query):
            out.append(rewrite(query[pos:start]))
            out.append(query[start:end])
            pos = end
        out.append(rewrite(query[pos:]))
        return "".join(out)

    def sql(self, query: str) -> DataFrame:
        """Run SQL containing ``share.schema.table`` identifiers: each known
        three-part name is resolved (lazily registering its view) and
        rewritten to the flat view name, then the query runs on Spark.
        ``information_schema.tables`` resolves to the catalog listing
        (the reference's examples/catalog.rs:8-15 surface). Identifiers are
        only rewritten in code regions — never inside quoted strings,
        backticks, or comments."""
        # the info-schema trigger must count CODE-region matches only: a
        # string literal spelling 'information_schema.tables' must neither
        # rewrite nor clobber a user temp view of that name as a side effect
        info_hits = 0

        def info_sub(text: str) -> str:
            nonlocal info_hits
            new, k = self._INFO_SCHEMA_RE.subn(
                "information_schema__tables", text)
            info_hits += k
            return new

        rewritten = self._rewrite_code_regions(query, info_sub)
        if info_hits:
            self.list_tables().createOrReplaceTempView(
                "information_schema__tables")
            query = rewritten

        def replace(match: re.Match) -> str:
            fqn = ".".join(match.groups())
            # exact spelling wins BEFORE the case-insensitive map: with
            # two tables differing only in case, the ci key is ambiguous
            # (None) and must not shadow an exactly-spelled reference
            canonical = fqn if fqn in self.tables else \
                self._tables_ci.get(fqn.lower())
            if canonical is None and fqn.lower() in self._tables_ci:
                raise KeyError(
                    f"table name {fqn!r} in SQL is ambiguous: multiple "
                    "catalog tables differ only in case; spell one exactly")
            if canonical is not None:
                self.table(canonical)  # ensure view exists
                return self.tables[canonical].view_name()
            return match.group(0)

        return self.spark.sql(self._rewrite_code_regions(
            query, lambda text: self._FQN_RE.sub(replace, text)))
