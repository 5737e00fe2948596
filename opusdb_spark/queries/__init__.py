"""Query implementations, one module per SURVEY.md §2B family.

Importing a module registers its queries in opusdb_spark.registry.
"""
