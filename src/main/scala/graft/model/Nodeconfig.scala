package graft.model

/** Typed accessors over a node's string-valued params with
  * default/min/max semantics and error messages matching the reference
  * (`helpers.go:9-94`).
  */
final case class Nodeconfig(params: Map[String, String]) {

  def intConfig(name: String, default: Int, min: Int = Int.MinValue, max: Int = Int.MaxValue): Either[String, Int] =
    intConfigRequired(name, min, max, Some(default))

  def intConfigRequired(name: String, min: Int = Int.MinValue, max: Int = Int.MaxValue, default: Option[Int] = None): Either[String, Int] =
    params.get(name).orElse(default.map(_.toString)) match {
      case None => Left(s"missing config value [$name]")
      case Some(v) =>
        v.toIntOption match {
          case None => Left(s"expected integer value for config [$name]")
          case Some(i) if i > max || i < min =>
            Left(s"config value [$name] requires value between [$min] and [$max]")
          case Some(i) => Right(i)
        }
    }

  def stringConfig(name: String, default: String): Either[String, String] =
    Right(params.getOrElse(name, default))

  def stringConfigRequired(name: String): Either[String, String] =
    params.get(name).toRight(s"missing config value [$name]")

  def float64Config(name: String, default: Double, min: Double = Double.MinValue, max: Double = Double.MaxValue): Either[String, Double] =
    float64ConfigRequired(name, min, max, Some(default))

  def float64ConfigRequired(name: String, min: Double = Double.MinValue, max: Double = Double.MaxValue, default: Option[Double] = None): Either[String, Double] =
    params.get(name).orElse(default.map(d => f"$d%f")) match {
      case None => Left(s"missing config value [$name]")
      case Some(v) =>
        v.toDoubleOption match {
          case None => Left(s"expected float64 value for config [$name]")
          case Some(d) if d > max || d < min =>
            Left(f"config value [$name] requires value between [$min%f] and [$max%f]")
          case Some(d) => Right(d)
        }
    }

  def boolConfig(name: String, default: Boolean): Boolean =
    params.get(name).map(_.equalsIgnoreCase("true")).getOrElse(default)
}
