"""Sources & sinks: GeoNames TSV, docs/extracted/geotagged tables,
JSON export/import (SURVEY.md §2.1)."""
