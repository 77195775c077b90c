from vicinity_spark.sources.hub import load_from_hub, push_to_hub

__all__ = ["load_from_hub", "push_to_hub"]
