from .scalar import channel_from_user, epoch_day, props_field, url_from_props

__all__ = ["epoch_day", "channel_from_user", "url_from_props", "props_field"]
