# Backbone family modules are imported lazily by models.zoo._load_builders.
