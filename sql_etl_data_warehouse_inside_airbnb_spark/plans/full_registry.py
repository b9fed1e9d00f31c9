"""Combined declared-query registry: relational core + extensions.

Importing this module populates ``REGISTRY`` with every query the
engine declares to the driver (``__spark_entry__.queries()``).
"""

from __future__ import annotations

# each import registers its queries into plans.registry.REGISTRY
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry  # noqa: F401
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    REGISTRY,
    Query,
)

import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_adv  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_ext  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_final  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_gaps  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_more  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_surface  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_wide  # noqa: F401

__all__ = ["REGISTRY", "Query"]
