"""The shelf catalog: shelf.yaml load/save and step registry (⇄ reference
src/shelf/core.py).

``shelf.yaml`` is the whole catalog: ``{version: 1, data_dir: data,
steps: {uri: [dep_uri, ...]}}``. Parsed into a :data:`~.types.Dag`.
"""

from __future__ import annotations

from pathlib import Path

from . import paths
from .exceptions import StepDefinitionError
from .schemas import validate
from .types import Dag, StepURI
from .utils import load_yaml, save_yaml


class Shelf:
    def __init__(self, config_path: Path | str = paths.CONFIG_FILE):
        self.config_path = Path(config_path)
        if not self.config_path.exists():
            raise StepDefinitionError(
                f"no shelf at {self.config_path} (run `shelf init` first)"
            )
        doc = load_yaml(self.config_path)
        validate(doc, "shelf")
        self.version: int = doc["version"]
        self.data_dir: str = doc.get("data_dir", "data")
        self.steps: Dag = {
            StepURI.parse(uri): [StepURI.parse(d) for d in deps or []]
            for uri, deps in (doc.get("steps") or {}).items()
        }

    # -- persistence --------------------------------------------------------

    @classmethod
    def init(cls, config_path: Path | str = paths.CONFIG_FILE) -> "Shelf":
        path = Path(config_path)
        if not path.exists():
            save_yaml({"version": 1, "data_dir": "data", "steps": {}}, path)
        return cls(path)

    def save(self) -> None:
        save_yaml(
            {
                "version": self.version,
                "data_dir": self.data_dir,
                "steps": {str(u): [str(d) for d in deps] for u, deps in sorted(self.steps.items())},
            },
            self.config_path,
        )

    # -- registry mutations -------------------------------------------------

    def add_step(self, uri: StepURI, deps: list[StepURI] | None = None) -> None:
        if uri in self.steps:
            raise StepDefinitionError(f"step already registered: {uri}")
        self.steps[uri] = deps or []

    def new_table(self, path: str, deps: list[str]) -> StepURI:
        uri = StepURI.parse(f"table://{path}")
        self.add_step(uri, [StepURI.parse(d) for d in deps])
        return uri

    # -- version resolution (⇄ reference core.py:71-79, __init__.py:273-282)

    def get_latest_version(self, uri: StepURI) -> StepURI:
        """Resolve a ``.../latest`` URI to the max concrete version.

        Lexicographic max over registered steps sharing the dataset path
        (ISO dates order correctly as strings).
        """
        prefix = uri.dataset_path
        candidates = [
            s
            for s in self.steps
            if s.scheme == uri.scheme
            and s.dataset_path == prefix
            and s.version != "latest"
        ]
        if not candidates:
            raise StepDefinitionError(f"no concrete version registered for {uri}")
        return max(candidates)

    def resolve_latest(self) -> Dag:
        """Rewrite every ``latest`` dependency to its newest concrete URI."""
        out: Dag = {}
        for step, deps in self.steps.items():
            out[step] = [
                self.get_latest_version(d) if d.version == "latest" else d for d in deps
            ]
        return out
