from osm_pt_validator_spark.functions.elements import (  # noqa: F401
    ROLE_PLATFORMS,
    ROLE_STOPS,
    ROLES_STOPLIKE,
    element_url,
    is_platform_role,
    is_ptv2,
    is_stop_role,
    is_stoplike_role,
    oneway_tag,
)
