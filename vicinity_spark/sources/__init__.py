from vicinity_spark.sources.hub import LocalHubClient, load_from_hub, push_to_hub

__all__ = ["LocalHubClient", "load_from_hub", "push_to_hub"]
