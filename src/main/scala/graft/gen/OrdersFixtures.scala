package graft.gen

/** The canonical schema-evolution scenario re-expressed as engine table
  * definitions (FIXTURES.md §1, from reference
  * `lambda/assets/orders_v1.json` / `orders_v2.json`): v1 → v2 adds a
  * root column (`order_id`), two nested struct fields
  * (`address.address_line`, `address.zip`), a field inside an
  * array-of-struct element (`order_items.element.item_count`), and
  * evolves the partition spec year→month.
  */
object OrdersFixtures {

  val ordersV1Json: String =
    """{
      |  "database_name": "customer_order",
      |  "table_name": "orders",
      |  "columns": [
      |    {"column_name": "order_time", "data_type": "timestamp"},
      |    {"column_name": "customer_name", "data_type": "string"},
      |    {"column_name": "address", "data_type": "struct", "struct_def": [
      |      {"column_name": "city", "data_type": "string"},
      |      {"column_name": "state", "data_type": "string"}
      |    ]},
      |    {"column_name": "order_items", "data_type": "array", "required": true,
      |     "array_def": {"column_name": "element", "data_type": "struct", "struct_def": [
      |        {"column_name": "item_id", "data_type": "string", "required": true},
      |        {"column_name": "price", "data_type": "float", "required": true}
      |     ]}}
      |  ],
      |  "partitions": [
      |    {"column": "order_time", "transform": "year"}
      |  ],
      |  "properties": {}
      |}""".stripMargin

  val ordersV2Json: String =
    """{
      |  "database_name": "customer_order",
      |  "table_name": "orders",
      |  "columns": [
      |    {"column_name": "order_id", "data_type": "string"},
      |    {"column_name": "order_time", "data_type": "timestamp"},
      |    {"column_name": "customer_name", "data_type": "string"},
      |    {"column_name": "address", "data_type": "struct", "struct_def": [
      |      {"column_name": "address_line", "data_type": "string"},
      |      {"column_name": "city", "data_type": "string"},
      |      {"column_name": "state", "data_type": "string"},
      |      {"column_name": "zip", "data_type": "string"}
      |    ]},
      |    {"column_name": "order_items", "data_type": "array", "required": true,
      |     "array_def": {"column_name": "element", "data_type": "struct", "struct_def": [
      |        {"column_name": "item_id", "data_type": "string"},
      |        {"column_name": "item_count", "data_type": "int", "required": true},
      |        {"column_name": "price", "data_type": "float"}
      |     ]}}
      |  ],
      |  "partitions": [
      |    {"column": "order_time", "transform": "month"}
      |  ],
      |  "properties": {}
      |}""".stripMargin
}
