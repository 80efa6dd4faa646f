from .mesh import DeviceIndex, device_map_step, make_sharded_step
