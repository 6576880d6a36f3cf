"""Operator stages: extraction, geotagging, serving analytics, dedup,
similarity, text quality, tiles.  Each module maps named reference
operators (SURVEY.md §2) to Spark-native implementations."""
