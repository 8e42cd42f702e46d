"""Query modules. Importing this package registers every SURVEY.md §2 key
into ``naqed_spark.registry`` (each module's ``@query`` decorators run at
import time). ``registry.load_all()`` imports this package; keep the list
below in sync as modules land.
"""

from naqed_spark.queries import (  # noqa: F401
    aggs,
    filters,
    fns,
    graph,
    joins,
    llm,
    llm_ext,
    scans,
    sets,
    sorts,
    storage,
    streaming,
    udfs,
    windows,
)
