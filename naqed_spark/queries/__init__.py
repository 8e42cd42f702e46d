"""Query modules. Importing this package registers every SURVEY.md §2 key
into ``naqed_spark.registry`` (each module's ``@query`` decorators run at
import time). ``registry.load_all()`` imports this package; keep the list
below in sync as modules land.

Import order is deliberate: it sets registration order, which is the order
the driver's correctness harness walks keys in. Round 2's driver run was
truncated after ~50 keys, so the families it never reached (streaming, llm,
llm_ext, udfs, windows, sets, sorts, storage, scans, the non-equi half of
joins) now register FIRST; the families with driver-green rows in
CORRECTNESS_r02.json (aggs, filters, fns, graph, equi-joins) register last
and rotate back in once the cap allows.
"""

from naqed_spark.queries import (  # noqa: F401
    streaming,
    llm,
    llm_ext,
    llm_dedup,
    udfs,
    windows,
    sets,
    sorts,
    storage,
    scans,
    subqueries,
    timeseries,
    joins,
    aggs,
    filters,
    fns,
    graph,
)
