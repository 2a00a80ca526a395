from quant_feature_pipeline_ray.stages.partition import partition_map_groups, with_bucket

__all__ = ["with_bucket", "partition_map_groups"]
