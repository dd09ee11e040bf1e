"""Validation config (reference: pkg/validation/config.go:3-13).

A tiny driver-side value object; its fields become literal columns /
broadcast arrays in the plans, so Catalyst constant-folds the disabled
checks away (e.g. ``minimum_node_members < 1`` prunes the whole
node-count aggregate, mirroring node_count.go:9-11).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ValidationConfig:
    naptan_platform_tags: bool = False
    minimum_node_members: int = 0
    ignore_traversal_direction_ways: tuple[int, ...] = field(default_factory=tuple)
    minimum_route_variants: int = 0


#: reference default: {NaptanPlatformTags: true} (config.go:11-13)
DEFAULT_CONFIG = ValidationConfig(naptan_platform_tags=True)
