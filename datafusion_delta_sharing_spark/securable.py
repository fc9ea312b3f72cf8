"""Securable naming: the ``share -> schema -> table`` hierarchy.

Parity target: ``/root/reference/src/securable.rs`` — ``Share {name, id}``
(:16-19), ``Schema {share, name}`` (:79-82), ``Table {name, schema, share,
share_id, id}`` (:149-155). String forms parse as ``share``,
``share.schema`` and ``share.schema.table`` (:65-71, :128-141, :260-273).
"""

from __future__ import annotations

from dataclasses import dataclass

from datafusion_delta_sharing_spark.errors import SecurableError


def _check_part(part: str, what: str, raw: str) -> str:
    part = part.strip()
    if not part:
        raise SecurableError(f"empty {what} in securable name {raw!r}")
    return part


@dataclass(frozen=True)
class Share:
    """A share: the root grant unit of the Delta Sharing namespace."""

    name: str
    id: str | None = None

    @classmethod
    def from_str(cls, raw: str) -> "Share":
        parts = raw.split(".")
        if len(parts) != 1:
            raise SecurableError(f"expected 'share', got {raw!r}")
        return cls(name=_check_part(parts[0], "share", raw))

    def __str__(self) -> str:
        return self.name


@dataclass(frozen=True)
class Schema:
    """A schema within a share."""

    share: str
    name: str
    id: str | None = None

    @classmethod
    def from_str(cls, raw: str) -> "Schema":
        parts = raw.split(".")
        if len(parts) != 2:
            raise SecurableError(f"expected 'share.schema', got {raw!r}")
        return cls(
            share=_check_part(parts[0], "share", raw),
            name=_check_part(parts[1], "schema", raw),
        )

    def full_name(self) -> str:
        return f"{self.share}.{self.name}"

    def __str__(self) -> str:
        return self.full_name()


@dataclass(frozen=True)
class Table:
    """A fully-qualified shared table: ``share.schema.table``."""

    share: str
    schema: str
    name: str
    id: str | None = None
    share_id: str | None = None

    @classmethod
    def from_str(cls, raw: str) -> "Table":
        parts = raw.split(".")
        if len(parts) != 3:
            raise SecurableError(f"expected 'share.schema.table', got {raw!r}")
        return cls(
            share=_check_part(parts[0], "share", raw),
            schema=_check_part(parts[1], "schema", raw),
            name=_check_part(parts[2], "table", raw),
        )

    def full_name(self) -> str:
        return f"{self.share}.{self.schema}.{self.name}"

    def view_name(self) -> str:
        """Spark-safe flat view name.

        Pure PySpark cannot install a JVM ``CatalogPlugin``, so three-part
        names surface as ``share__schema__table`` temp views (SURVEY.md §7).

        The flattening is NOT injective (``a__b.c.t`` and ``a.b__c.t``
        both yield ``a__b__c__t``); DeltaSharingCatalog refuses to
        register a second FQN whose view name collides (case-insensitively)
        with an already-owned one (catalog.py ``_view_owner``) rather than
        silently clobbering the first view.
        """
        return f"{self.share}__{self.schema}__{self.name}"

    def __str__(self) -> str:
        return self.full_name()


def parse_securable(raw: str) -> Share | Schema | Table:
    """Parse any of the three securable string forms by dot count."""
    n = raw.count(".")
    if n == 0:
        return Share.from_str(raw)
    if n == 1:
        return Schema.from_str(raw)
    if n == 2:
        return Table.from_str(raw)
    raise SecurableError(f"too many name parts in {raw!r}")
