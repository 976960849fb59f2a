"""Driver-contract query modules (split from __spark_entry__.py, VERDICT r03 #4)."""
