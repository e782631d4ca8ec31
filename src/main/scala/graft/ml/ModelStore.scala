package graft.ml

import java.io.{File, FileInputStream, FileOutputStream, ObjectInputStream,
  ObjectOutputStream}

/** M11/S11 — champion persistence with the reference's path convention
  * `{dir}/{plant}_{대분류}/champion.*` (ref: trainer.py:582-646). Local
  * models are Java-serialized; a sidecar text file records the champion
  * name + RMSE for inspection without deserializing.
  */
object ModelStore {

  private def dirFor(base: String, plant: String, major: String): File =
    new File(base, s"${plant}_$major")

  def saveChampion(base: String, plant: String, major: String,
      model: ForecastModel, rmse: Double): Unit = {
    val dir = dirFor(base, plant, major)
    dir.mkdirs()
    val oos = new ObjectOutputStream(
      new FileOutputStream(new File(dir, "champion.bin")))
    try oos.writeObject(model) finally oos.close()
    val meta = new java.io.PrintWriter(new File(dir, "champion.txt"), "UTF-8")
    try meta.println(s"${model.name}\t$rmse") finally meta.close()
  }

  def loadChampion(base: String, plant: String, major: String)
      : Option[ForecastModel] = {
    val f = new File(dirFor(base, plant, major), "champion.bin")
    if (!f.exists()) None
    else {
      val ois = new ObjectInputStream(new FileInputStream(f))
      try Some(ois.readObject().asInstanceOf[ForecastModel])
      finally ois.close()
    }
  }
}
