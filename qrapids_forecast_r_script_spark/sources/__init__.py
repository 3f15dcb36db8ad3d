from .registry import (load_table, load_all, search_element, load_series,
                       events_as_metrics, source_fingerprint)

__all__ = ["load_table", "load_all", "search_element", "load_series",
           "events_as_metrics", "source_fingerprint"]
