"""Named queries binding engine operators to the fixture tables.

Each module registers queries via ``etlalchemy_spark.registry.register``.
The module split mirrors SURVEY.md §2's operator families.
"""
