"""python_ctd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pyoceans/python-ctd (reference at
/root/reference, BSD-3-Clause), re-architected for Spark.

The reference is a single-machine pandas library: seven instrument-file
readers plus a fluent chain of ordered signal-processing operators over
pressure-indexed DataFrames (``ctd/processing.py``, ``ctd/read.py``,
``ctd/extras.py``).  This engine re-expresses every one of those operators
Spark-first:

- the *cast* (one instrument profile, reference ``ctd/processing.py:8``)
  becomes a partition of one long-format distributed DataFrame keyed by
  ``cast_id`` and ordered by an explicit ``scan`` column;
- every order-dependent kernel becomes a ``Window.partitionBy(cast).orderBy
  (scan)`` expression (JVM-side, whole-stage-codegen) where semantics allow,
  and a per-cast ``applyInPandas`` kernel where they don't (sequential IIR
  filter, reflect-padded convolution);
- file parsing becomes a distributed ``binaryFile`` scan + ``mapInPandas``
  per-file parser.

Scale model: a cast is small (<= ~1e5 rows, reference test data); 100 TB
comes from *many* casts, which partition perfectly by ``cast_id``.  Nothing
in this package collects data to the driver except explicit sinks.
"""

from python_ctd_spark.session import get_spark, stop_spark
from python_ctd_spark.api import CtdFrame
from python_ctd_spark.corpus import Corpus
from python_ctd_spark.operators.filters import remove_above_water, remove_up_to
from python_ctd_spark.operators.ordered import (
    split,
    press_check,
    movingaverage,
    ffill,
    interpolate_index,
    cumsum,
)
from python_ctd_spark.operators.binning import bindata
from python_ctd_spark.operators.signal import despike, lp_filter, smooth
from python_ctd_spark.operators.derive import (
    cell_thermal_mass,
    mixed_layer_depth,
    barrier_layer_thickness,
    get_maxdepth,
)
from python_ctd_spark.operators.join import (
    align_frames,
    asof_join,
    interval_join,
    with_meta,
)

__all__ = [
    "CtdFrame",
    "Corpus",
    "get_spark",
    "stop_spark",
    "remove_above_water",
    "remove_up_to",
    "split",
    "press_check",
    "movingaverage",
    "ffill",
    "interpolate_index",
    "cumsum",
    "bindata",
    "despike",
    "lp_filter",
    "smooth",
    "cell_thermal_mass",
    "mixed_layer_depth",
    "barrier_layer_thickness",
    "get_maxdepth",
    "align_frames",
    "asof_join",
    "interval_join",
    "with_meta",
]

__version__ = "0.1.0"
