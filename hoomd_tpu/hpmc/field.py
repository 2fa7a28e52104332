"""hpmc.field — placeholder module; implementations land later this round."""
