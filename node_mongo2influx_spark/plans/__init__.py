"""Query library: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable, each paired with a DuckDB oracle SQL string."""
