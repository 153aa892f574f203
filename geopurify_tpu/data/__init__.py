"""Host-side data pipeline: scene/camera readers, point-cloud IO, augmentation,
view enumeration, and the padded SceneBatch device contract."""
