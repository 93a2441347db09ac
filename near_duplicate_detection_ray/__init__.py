"""ray-ndd: Ray-Data-native near-duplicate detection & clustering for transcript tables."""
