from . import (  # noqa: F401
    projection,
    joins,
    aggregates,
    windows,
    sorts,
    sets,
    geo,
    events,
    llm,
    udfs,
)
