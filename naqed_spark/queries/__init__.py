"""Query modules. Importing this package registers every SURVEY.md §2 key
into ``naqed_spark.registry`` (each module's ``@query`` decorators run at
import time). ``registry.load_all()`` imports this package; keep the list
below in sync as modules land.

Registration order used to drive the driver's key walk; since round 4 the
authoritative driver-facing order is ``registry.PRIORITY`` +
``registry.ordered_keys()`` (the 40 keys with no driver signal from r2/r3
go first). Import order below only breaks ties behind PRIORITY.
"""

from naqed_spark.queries import (  # noqa: F401
    compiler_ops,
    streaming,
    llm,
    llm_ext,
    llm_dedup,
    llm_contam,
    llm_ann,
    llm_mix,
    llm_fp,
    udfs,
    windows,
    sets,
    sorts,
    storage,
    scans,
    subqueries,
    timeseries,
    tpch,
    joins,
    aggs,
    filters,
    fns,
    graph,
)
