"""Fluent API — the engine's analog of the reference's pandas-flavor
method registration (ctd/processing.py:21-22 registers each operator on
DataFrame and Series at import time).

``CtdFrame`` is a thin wrapper over a native ``pyspark.sql.DataFrame``:
every method appends lazily to the Catalyst logical plan and returns a new
``CtdFrame``; nothing executes until an action.  The wrapper pins the cast
key / order / pressure conventions once so call sites read like the
reference's fluent chains:

    down = (CtdFrame(df)
            .remove_above_water()
            .split().down()
            .despike(n1=2, n2=20, block=100)
            .lp_filter()
            .press_check()
            .interpolate_index()
            .bindata(delta=1.0)
            .smooth(window_len=21, window="hanning"))
    result = down.df   # plain Spark DataFrame, still lazy
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from python_ctd_spark.operators import binning, derive, filters, ordered, signal
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


class CtdFrame:
    """Chainable, lazy, cast-aware view over a Spark DataFrame."""

    def __init__(
        self,
        df: DataFrame,
        by=CAST_ID,
        order=SCAN,
        pressure: str = PRESSURE,
    ):
        self.df = df
        self.by = by
        self.order = order
        self.pressure = pressure

    def _wrap(self, df: DataFrame) -> "CtdFrame":
        return CtdFrame(df, by=self.by, order=self.order, pressure=self.pressure)

    def _kw(self):
        return {"by": self.by, "order": self.order, "pressure": self.pressure}

    # -- projections / filters ------------------------------------------
    def select_channels(self, *cols: str) -> "CtdFrame":
        keep = [*([self.by] if isinstance(self.by, str) else self.by)]
        keep += [self.order] if isinstance(self.order, str) else list(self.order)
        keep.append(self.pressure)
        return self._wrap(self.df.select(*keep, *cols))

    def remove_above_water(self) -> "CtdFrame":
        return self._wrap(filters.remove_above_water(self.df, pressure=self.pressure))

    def remove_up_to(self, idx: float) -> "CtdFrame":
        return self._wrap(filters.remove_up_to(self.df, idx, pressure=self.pressure))

    # -- ordered ops ----------------------------------------------------
    def split(self, leg_col: str = "leg") -> "CtdFrame":
        return self._wrap(
            ordered.split(self.df, leg_col=leg_col, **self._kw())
        )

    def down(self, leg_col: str = "leg") -> "CtdFrame":
        return self._wrap(self.df.filter(F.col(leg_col) == "down").drop(leg_col))

    def up(self, leg_col: str = "leg") -> "CtdFrame":
        return self._wrap(self.df.filter(F.col(leg_col) == "up").drop(leg_col))

    def press_check(self, cols=None) -> "CtdFrame":
        return self._wrap(ordered.press_check(self.df, cols=cols, **self._kw()))

    def movingaverage(self, window_size: int = 48, cols=None) -> "CtdFrame":
        return self._wrap(
            ordered.movingaverage(self.df, window_size=window_size, cols=cols, **self._kw())
        )

    def ffill(self, cols=None) -> "CtdFrame":
        return self._wrap(
            ordered.ffill(self.df, cols=cols, by=self.by, order=self.order)
        )

    def interpolate_index(self, cols=None) -> "CtdFrame":
        return self._wrap(ordered.interpolate_index(self.df, cols=cols, **self._kw()))

    def cumsum(self, cols=None) -> "CtdFrame":
        return self._wrap(ordered.cumsum(self.df, cols=cols, by=self.by, order=self.order))

    # -- binning --------------------------------------------------------
    def bindata(self, delta: float = 1.0, method: str = "average", cols=None) -> "CtdFrame":
        out = binning.bindata(self.df, delta=delta, method=method, cols=cols, **self._kw())
        # the binned frame is keyed by the bin grid: the original scan
        # order is gone and the pressure column IS the order — chained
        # ordered ops (the reference's canonical .bindata().smooth())
        # sort by it
        return CtdFrame(out, by=self.by, order=self.pressure, pressure=self.pressure)

    # -- signal ---------------------------------------------------------
    def despike(self, n1: float = 2, n2: float = 20, block: int = 100, cols=None) -> "CtdFrame":
        return self._wrap(
            signal.despike(self.df, n1=n1, n2=n2, block=block, cols=cols, **self._kw())
        )

    def lp_filter(self, sample_rate: float = 24.0, time_constant: float = 0.15, cols=None) -> "CtdFrame":
        return self._wrap(
            signal.lp_filter(
                self.df, sample_rate=sample_rate, time_constant=time_constant,
                cols=cols, **self._kw(),
            )
        )

    def smooth(self, window_len: int = 11, window: str = "hanning", cols=None) -> "CtdFrame":
        return self._wrap(
            signal.smooth(self.df, window_len=window_len, window=window, cols=cols, **self._kw())
        )

    def smooth_native(self, window_len: int = 11, window: str = "hanning", cols=None) -> "CtdFrame":
        return self._wrap(
            signal.smooth_native(
                self.df, window_len=window_len, window=window, cols=cols,
                by=self.by, order=self.order,
            )
        )

    # -- derived --------------------------------------------------------
    def cell_thermal_mass(
        self, temperature: str, conductivity: str, out_col: str = "ctm"
    ) -> "CtdFrame":
        return self._wrap(
            derive.cell_thermal_mass(
                self.df, temperature=temperature, conductivity=conductivity,
                out_col=out_col, by=self.by, order=self.order,
            )
        )

    def barrier_layer_thickness(self, sa: str, ct: str, out_col: str = "BLT") -> "CtdFrame":
        return self._wrap(
            derive.barrier_layer_thickness(
                self.df, sa=sa, ct=ct, out_col=out_col, by=self.by, order=self.order
            )
        )

    def mixed_layer_depth(self, ct: str, out_col: str = "MLD") -> "CtdFrame":
        return self._wrap(
            derive.mixed_layer_depth(self.df, ct=ct, out_col=out_col, by=self.by, order=self.order)
        )

    def get_maxdepth(self, cols=None) -> DataFrame:
        return derive.get_maxdepth(self.df, cols=cols, by=self.by, pressure=self.pressure)

    # -- escape hatch ---------------------------------------------------
    def transform(self, fn, *args, **kwargs) -> "CtdFrame":
        """Apply any ``f(df, *args, **kwargs) -> df`` — the Spark analog of
        the reference's method-registration extension point."""
        return self._wrap(fn(self.df, *args, **kwargs))
