"""Round-2+ extension queries.

This module is loaded LAST by the registry (see ``registry._OPERATOR_MODULES``)
so additions here can never push a SURVEY §2-critical query out of the
driver's 50-query correctness window.
"""

from __future__ import annotations
