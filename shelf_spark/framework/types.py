"""Core framework types (⇄ reference src/shelf/types.py:10-57).

A *step* is a node of the build DAG, addressed by a URI:

    snapshot://<namespace>/.../<version>
    table://<namespace>/.../<version>

``version`` is an ISO date (``2024-07-26``) or the literal ``latest``.
Ordering is lexicographic on the full URI string — ISO dates sort
correctly and ``latest`` sorts after any date, which is exactly what
`latest`-resolution relies on (reference core.py:71-79).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Literal

from .exceptions import StepDefinitionError

#: step → its upstream dependencies (reference types.py:11)
Dag = dict["StepURI", list["StepURI"]]

#: filename → sha256 hex digest (reference types.py:10)
Manifest = dict[str, str]

#: column name → canonical dtype string; unlike the reference (which
#: stores Polars dtype reprs, types.py:12-13), we use Spark DDL
#: simpleString names so declared and inferred schemas share one
#: vocabulary (fixes the latent mismatch noted in SURVEY §1.2).
Schema = dict[str, str]

SCHEMES = ("snapshot", "table")

_URI_RE = re.compile(r"^(?P<scheme>[a-z]+)://(?P<path>[A-Za-z0-9_./-]+)$")
_VERSION_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def is_valid_version(segment: str) -> bool:
    """True for an ISO date or the literal ``latest``."""
    return segment == "latest" or bool(_VERSION_RE.match(segment))


@dataclass(frozen=True, order=True)
class StepURI:
    """Parsed step address. Total order = lexicographic on str(self)."""

    scheme: Literal["snapshot", "table"]
    path: str

    @classmethod
    def parse(cls, uri: str) -> StepURI:
        m = _URI_RE.match(uri)
        if not m:
            raise StepDefinitionError(f"malformed step URI: {uri!r}")
        scheme = m.group("scheme")
        if scheme not in SCHEMES:
            raise StepDefinitionError(f"unknown scheme {scheme!r} in {uri!r}")
        return cls(scheme, m.group("path"))  # type: ignore[arg-type]

    def __str__(self) -> str:
        return f"{self.scheme}://{self.path}"

    @property
    def version(self) -> str:
        return self.path.rsplit("/", 1)[-1]

    @property
    def dataset_path(self) -> str:
        """Path without the trailing version segment."""
        return self.path.rsplit("/", 1)[0]

    def with_version(self, version: str) -> StepURI:
        return StepURI(self.scheme, f"{self.dataset_path}/{version}")
