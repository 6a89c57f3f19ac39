from .rollups import rollup_from_second, rollup_chain  # noqa: F401
