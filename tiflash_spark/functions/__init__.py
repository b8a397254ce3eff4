"""MySQL/TiDB-semantics scalar function layer (SURVEY.md §2.4).

The reference maps 560 tipb::ScalarFuncSig signatures onto ~170 vectorized
functions (dbms/src/Flash/Coprocessor/DAGUtils.cpp:92-759). Most are 1:1
with pyspark.sql.functions; this package holds the compat shims for the
MySQL edge semantics (NULL-on-div-by-zero, date-format tokens, conv, elt,
substring_index ordering, vector distances) — all as JVM-side Column
expressions, never row-at-a-time Python UDFs.
"""

from tiflash_spark.functions.mysql_compat import (
    mysql_date_format,
    mysql_div,
    mysql_elt,
    mysql_if,
    mysql_ifnull,
    mysql_mod,
)
from tiflash_spark.functions.vector import (
    vec_cosine_distance,
    vec_dims,
    vec_inner_product,
    vec_l1_distance,
    vec_l2_distance,
    vec_l2_norm,
)

__all__ = [
    "mysql_date_format",
    "mysql_div",
    "mysql_elt",
    "mysql_if",
    "mysql_ifnull",
    "mysql_mod",
    "vec_cosine_distance",
    "vec_dims",
    "vec_inner_product",
    "vec_l1_distance",
    "vec_l2_distance",
    "vec_l2_norm",
]
